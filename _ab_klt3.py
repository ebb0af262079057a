"""Find the ~7ms of track_keypoints not accounted for by level passes."""
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
    print("%-30s %8.3f ms" % (label, (time.perf_counter() - t0) / n * 1e3))
    return out


scharr0 = jax.jit(lambda im: img_ops.scharr(im))
bench("scharr level0", lambda: scharr0(p1[0]))
fwd = jax.jit(lambda: klt.lk_flow(p1, p2, pts, pts, pvalid, 21, 30, 0.01))
bench("lk_flow fwd (3 levels)", fwd)
bwd = jax.jit(lambda: klt.lk_flow(p2[:1], p1[:1], pts, pts, pvalid, 21, 30, 0.01,
                                  search_top=32))
bench("lk_flow bwd (level0 only)", bwd)

ix2, iy2 = img_ops.scharr(p1[2])
top = jax.jit(lambda: klt._track_level_mxu(
    p1[2], ix2, iy2, p2[2], pts / 4, pts / 4, pvalid, win=21, iters=30,
    eps=0.01, final=False, search=64))
bench("top level pass s=64", top)
