"""Isolate KLT cost: iteration loop vs per-level setup (gathers)."""
import time
import numpy as np
import jax, jax.numpy as jnp
from xrslam_tpu.frontend import image as img_ops, klt

H, W, C = 480, 752, 256
rng = np.random.default_rng(0)
base = np.kron(rng.uniform(0, 1, (H // 4, W // 4)), np.ones((4, 4)))
img1 = jnp.asarray(base.astype(np.float32))
img2 = jnp.asarray(np.roll(base, (2, 3), axis=(0, 1)).astype(np.float32))
pts = jnp.asarray(rng.uniform(40, 400, (C, 2)).astype(np.float32))
pvalid = jnp.ones((C,), bool)
pre = jax.jit(lambda im: img_ops.build_pyramid(img_ops.clahe(im * 255.0), levels=3))
p1, p2 = pre(img1), pre(img2)
jax.block_until_ready((p1, p2))


def bench(label, fn, n=50):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    print("%-28s %8.3f ms" % (label, (time.perf_counter() - t0) / n * 1e3))
    return out


bench("fwd+bwd iters=30", lambda: klt.track_keypoints(p1, p2, pts, pts, pvalid))
bench("fwd+bwd iters=1", lambda: klt.track_keypoints(p1, p2, pts, pts, pvalid, iters=1))
bench("fwd+bwd iters=8", lambda: klt.track_keypoints(p1, p2, pts, pts, pvalid, iters=8))

# single level-0 MXU pass, search 32
ix, iy = img_ops.scharr(p1[0])
lvl = jax.jit(lambda: klt._track_level_mxu(
    p1[0], ix, iy, p2[0], pts, pts, pvalid, win=21, iters=30, eps=0.01,
    final=True, search=32))
bench("one level-0 pass s=32", lvl)
lvl1 = jax.jit(lambda: klt._track_level_mxu(
    p1[0], ix, iy, p2[0], pts, pts, pvalid, win=21, iters=1, eps=0.01,
    final=True, search=32))
bench("one level-0 pass iters=1", lvl1)
