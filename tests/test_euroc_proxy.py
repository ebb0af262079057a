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

    # tracking-rate gate: init completes (~frame 29-31 on the rendered
    # wave scenes — the initializer gathers its 8-keyframe baseline
    # first) and tracking holds to the end with no resets
    assert len(ts) >= n_frames - 35, len(ts)
    ate = evaluate_ate(root, ts, ps)
    # accuracy gate: the reference's own EuRoC average is 0.125 m over
    # far longer/harder real sequences; this clean proxy must stay well
    # inside it (measured ~0.06-0.10 across seeds on this stack)
    assert np.isfinite(ate) and ate < 0.125, ate
