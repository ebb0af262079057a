"""EuRoC-readiness proxy gate (no real EuRoC data is mountable in this
environment): a rendered sequence with EuRoC's sensor geometry —
752x480 @ 20 Hz camera, 200 Hz IMU, ~458 px focal, textured-blob image
statistics — driven through the REAL full stack (PNG decode → reader →
YAML config → api.XRSLAM → CLAHE/GFTT/KLT → initializer → sliding
window → ATE), with the accuracy and tracking-rate LOCKED as regression
gates.

The day a real EuRoC mount exists, the 11-sequence table is one
command (documented in README.md §Benchmarks):

    python -m xrslam_tpu.tools.run_benchmark \
        euroc:///data/euroc/MH_01_easy/mav0 ... euroc:///data/euroc/V2_03_difficult/mav0 \
        --slam-config configs/euroc_slam.yaml \
        --device-config configs/euroc_sensor.yaml --tum-prefix out/euroc

and the acceptance bound is the reference's published table
(/root/reference/docs/en/benchmark.md:12 — avg ATE RMSE 0.125 m;
BASELINE.md).
"""

import os

import numpy as np
import pytest


@pytest.mark.slow
def test_euroc_geometry_proxy_pipeline():
    from xrslam_tpu.tools.make_dataset import render_dataset
    from xrslam_tpu.config import load_config
    from xrslam_tpu.tools.run_dataset import evaluate_ate, run_sequence

    d = "/tmp/xrslam_euroc_proxy"
    n_frames = 60
    if not os.path.exists(os.path.join(d, "slam.yaml")):
        render_dataset(d, n_frames=n_frames, n_landmarks=700,
                       width=752, height=480, focal=458.0, seed=5)
    cfg = load_config(os.path.join(d, "slam.yaml"),
                      os.path.join(d, "device.yaml"))
    root = os.path.join(d, "mav0")
    ts, qs, ps = run_sequence("euroc://" + root, cfg, async_reader=False)

    # tracking-rate gates, locked to observed behavior (measured on
    # this scene: init completes at frame 29 — the initializer first
    # gathers its 8-keyframe × gap-3 baseline — then every remaining
    # frame tracks with zero resets):
    #   1. initialization is not late (first tracked frame <= 32),
    #   2. no tracker reset afterwards (outputs are exactly the
    #      contiguous tail of the camera timestamps).
    import csv

    stamps = []
    with open(os.path.join(root, "cam0", "data.csv")) as f:
        for row in csv.reader(f):
            if row and row[0][:1].isdigit():
                stamps.append(float(row[0]) * 1e-9)
    stamps = np.asarray(stamps)
    ts = np.asarray(ts)
    assert len(ts) > 0, "no frames tracked"
    idx0 = int(np.argmin(np.abs(stamps - ts[0])))
    assert idx0 <= 32, f"initialization late: first tracked frame {idx0}"
    tail = stamps[idx0:]
    assert len(ts) == len(tail) and np.allclose(ts, tail, atol=1e-6), \
        f"tracker reset mid-sequence: {len(ts)} tracked vs {len(tail)} " \
        "frames after init"
    ate = evaluate_ate(root, ts, ps)
    # accuracy gate at measured + margin (measured 0.011 m on this
    # clean rendered scene; the reference's own EuRoC average over real
    # sequences is 0.125 m — docs/en/benchmark.md:12)
    assert np.isfinite(ate) and ate < 0.06, ate
