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

out = klt.track_keypoints(p1, p2, pts, pts, pvalid)
jax.block_until_ready(out)
n = 50
t0 = time.perf_counter()
for _ in range(n):
    out = klt.track_keypoints(p1, p2, pts, pts, pvalid)
jax.block_until_ready(out)
print("klt fwd+bwd: %.3f ms" % ((time.perf_counter() - t0) / n * 1e3))
print("tracked:", int(np.asarray(out[1]).sum()))
print("mean flow err vs (3,2):", float(np.abs(np.asarray(out[0]) - (np.asarray(pts) + np.array([3, 2]))).mean()))
