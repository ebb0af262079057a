"""A/B the reprojection-assembly backends on the current jax backend.

Times `solver.assemble` (the full normal-equation build) and a
10-iteration `solve_window` for each backend in XR_ASSEMBLE_BACKEND
{einsum, gram, pallas} and checks the assembled systems agree. jit
caches are cleared between variants (the backend switch is read at
trace time). Records the round-4 deliverable of the solver-side Pallas
goal (anchor: reference SPARSE_SCHUR solver.cpp:176-190 and the
hand-rolled landmark Schur, ceres/marginalization_factor.h:382-434).

Usage: python -m xrslam_tpu.tools.ab_assemble [--K 12] [--L 384]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run(K=12, L=384, reps=50):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from xrslam_tpu.estimation.solver import SolveOptions, assemble, solve_window
    from xrslam_tpu.io.synthetic import demo_window_problem

    st, data = demo_window_problem(K, L, jax.dtypes.canonicalize_dtype(jnp.float64))
    opts = SolveOptions(iterations=10)
    opts1 = SolveOptions(iterations=1)

    out = {"backend": jax.default_backend(), "K": K, "L": L}
    ref_sys = None
    for b in ("einsum", "gram", "pallas"):
        os.environ["XR_ASSEMBLE_BACKEND"] = b
        jax.clear_caches()
        rec = {}
        try:
            asm = jax.jit(lambda s, d: assemble(s, d, opts1))
            sys_ = asm(st, data)
            jax.block_until_ready(sys_)
            t0 = time.perf_counter()
            for _ in range(reps):
                sys_ = asm(st, data)
            jax.block_until_ready(sys_)
            rec["assemble_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 3)

            sv = lambda s, d: solve_window(s, d, opts)[0]
            r = sv(st, data)
            jax.block_until_ready(r)
            t0 = time.perf_counter()
            for _ in range(reps):
                r = sv(st, data)
            jax.block_until_ready(r)
            rec["solve10_ms"] = round((time.perf_counter() - t0) / reps * 1e3, 3)

            if ref_sys is None:
                ref_sys = [np.asarray(x) for x in sys_]
                rec["rel_diff_vs_einsum"] = 0.0
            else:
                # relative to each output's own scale: the f32-on-TPU
                # matmuls multiply in bf16 by default for EVERY
                # backend, so the meaningful check is that the
                # formulations agree to bf16-noise level
                d = max(float(np.max(np.abs(np.asarray(a) - b_))
                              / max(np.max(np.abs(b_)), 1e-30))
                        for a, b_ in zip(sys_, ref_sys))
                rec["rel_diff_vs_einsum"] = d
        except Exception as e:  # pragma: no cover
            rec["error"] = repr(e)[:300]
        out[b] = rec
    os.environ.pop("XR_ASSEMBLE_BACKEND", None)
    jax.clear_caches()
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--K", type=int, default=12)
    ap.add_argument("--L", type=int, default=384)
    ap.add_argument("--reps", type=int, default=50)
    args = ap.parse_args(argv)
    print(json.dumps(run(args.K, args.L, args.reps)))


if __name__ == "__main__":
    main()
