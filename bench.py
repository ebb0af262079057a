"""Benchmark: batched sliding-window VI-BA solve throughput on one chip.

Each "frame" is one full 10-iteration LM solve of a reference-sized
window (K=10 keyframes — config.cpp:16 — L=256 landmark slots, the
dense-map configuration) — the dominant per-keyframe cost of the VIO
pipeline (reference refine_window, sliding_window_tracker.cpp:247-358,
Ceres ≤30 iterations with early exit; 10 is the observed effective
iteration count and the solver-config default, euroc_slam.yaml:31).

Baseline: the reference runs EuRoC real time on CPU, i.e. one such
solve per keyframe at the 20 Hz camera rate (docs/en/benchmark.md,
BASELINE.json north star: ">2x reference CPU frames/s per chip"), so
vs_baseline = frames_per_s / 20.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time


def main():
    import jax
    import jax.numpy as jnp

    from xrslam_tpu.estimation.solver import SolveOptions, solve_window
    from __graft_entry__ import _problem

    K, L, B = 10, 256, 16
    state, data = _problem(K=K, L=L, dtype=jnp.float32, n_lm=120)
    batch_state = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), state)
    batch_data = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data)

    opts = SolveOptions(iterations=10)

    @jax.jit
    def step(bs, bd):
        out, info = jax.vmap(lambda s, d: solve_window(s, d, opts))(bs, bd)
        return info["cost"]

    # compile + warmup
    cost = step(batch_state, batch_data)
    jax.block_until_ready(cost)

    n_reps = 10
    t0 = time.perf_counter()
    for _ in range(n_reps):
        cost = step(batch_state, batch_data)
    jax.block_until_ready(cost)
    dt = time.perf_counter() - t0

    frames_per_s = n_reps * B / dt
    print(json.dumps({
        "metric": "vio_window_solves_per_s",
        "value": round(frames_per_s, 2),
        "unit": "solves/s (K=10,L=256,10 LM iters, f32, batch 16)",
        "vs_baseline": round(frames_per_s / 20.0, 2),
    }))


if __name__ == "__main__":
    main()
