"""A/B the LK level-tracker backends on the current jax backend.

Times `klt.track_keypoints` (fwd+bwd, full gate set) on a EuRoC-size
frame for each backend in XR_LK_BACKEND {mxu, pallas, xla} and checks
they agree on tracked points. jit caches are cleared between variants
(monkeypatched dispatch flags otherwise silently reuse the compiled
winner — see CLAUDE.md).

Usage: python -m xrslam_tpu.tools.ab_lk_backend [--backends mxu,pallas]
"""

from __future__ import annotations

import argparse
import json
import os
import time


def run(backends, n_reps=20, C=256):
    import numpy as np

    os.environ.setdefault("XR_LK_BACKEND", "mxu")
    import jax
    import jax.numpy as jnp

    from xrslam_tpu.frontend import image as img_ops
    from xrslam_tpu.frontend import klt

    H, W = 480, 752
    rng = np.random.default_rng(0)
    base = np.kron(rng.uniform(0, 1, (H // 4, W // 4)), np.ones((4, 4)))
    img1 = jnp.asarray(base.astype(np.float32)) * 255.0
    img2 = jnp.asarray(np.roll(base, (2, 3), axis=(0, 1)).astype(np.float32)) * 255.0
    pyr1 = img_ops.build_pyramid(img1, levels=3)
    pyr2 = img_ops.build_pyramid(img2, levels=3)
    pts = jnp.asarray(rng.uniform(40, 400, (C, 2)).astype(np.float32))
    valid = jnp.ones((C,), bool)

    out = {}
    ref_pts = None
    for b in backends:
        os.environ["XR_LK_BACKEND"] = b
        jax.clear_caches()
        try:
            nxt, st = klt.track_keypoints(pyr1, pyr2, pts, pts, valid)
            jax.block_until_ready((nxt, st))
            t0 = time.perf_counter()
            for _ in range(n_reps):
                nxt, st = klt.track_keypoints(pyr1, pyr2, pts, pts, valid)
            jax.block_until_ready((nxt, st))
            dt = (time.perf_counter() - t0) / n_reps
            nxt = np.asarray(nxt)
            st = np.asarray(st)
            rec = {"ms_per_call": round(dt * 1e3, 2),
                   "tracked": int(st.sum())}
            if ref_pts is None:
                ref_pts = (nxt, st)
            else:
                both = st & ref_pts[1]
                if both.any():
                    d = np.linalg.norm(nxt[both] - ref_pts[0][both], axis=1)
                    rec["max_px_vs_first"] = round(float(d.max()), 3)
                rec["status_agree"] = round(float((st == ref_pts[1]).mean()), 3)
            out[b] = rec
        except Exception as e:  # pragma: no cover
            out[b] = {"error": repr(e)[:200]}
    return out


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--backends", default="mxu,pallas")
    ap.add_argument("--reps", type=int, default=20)
    args = ap.parse_args(argv)
    print(json.dumps(run(args.backends.split(","), n_reps=args.reps)))


if __name__ == "__main__":
    main()
