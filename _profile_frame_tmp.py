"""Per-stage timing of the bench frame on TPU."""
import time
import numpy as np
import jax
import jax.numpy as jnp

from xrslam_tpu.estimation.solver import SolveOptions, solve_window
from xrslam_tpu.frontend import image as img_ops
from xrslam_tpu.frontend import klt
from __graft_entry__ import _problem

H, W, C = 480, 752, 256
rng = np.random.default_rng(0)
base = np.kron(rng.uniform(0, 1, (H // 4, W // 4)), np.ones((4, 4)))
img1 = jnp.asarray(base.astype(np.float32))
img2 = jnp.asarray(np.roll(base, (2, 3), axis=(0, 1)).astype(np.float32))
pts = jnp.asarray(rng.uniform(40, 400, (C, 2)).astype(np.float32))
pvalid = jnp.ones((C,), bool)

preprocess = jax.jit(lambda im: img_ops.build_pyramid(img_ops.clahe(im * 255.0), levels=3))
detect = lambda im: img_ops.gftt_candidates(im)[0]

K, L = 10, 256
state, data = _problem(K=K, L=L, dtype=jnp.float32, n_lm=120)
opts = SolveOptions(iterations=10)
solve = jax.jit(lambda s, d: solve_window(s, d, opts)[1]["cost"])

pyr1 = preprocess(img1); jax.block_until_ready(pyr1)
pyr2 = preprocess(img2); jax.block_until_ready(pyr2)

stages = {
    "preprocess": lambda: preprocess(img2),
    "gftt": lambda: detect(pyr2[0]),
    "klt_fwd_bwd": lambda: klt.track_keypoints(pyr1, pyr2, pts, pts, pvalid),
    "solve10": lambda: solve(state, data),
}
for name, fn in stages.items():
    out = fn(); jax.block_until_ready(out)  # compile
    n = 30
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n
    print(f"{name:14s} {dt*1e3:8.3f} ms")
