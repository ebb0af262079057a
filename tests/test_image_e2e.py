"""Full image-based end-to-end regression: rendered synthetic dataset →
PNG decode → reader → YAML config → public API → CLAHE/GFTT/KLT →
initializer → sliding window → TUM trajectory → ATE.

This is the complete real-frontend stack (the bearing-fed
test_pipeline_e2e bypasses the image pipeline); accuracy bound chosen
from the observed ~0.10 m ATE on this scene (blob imagery, 3 m-radius
trajectory) with headroom."""

import numpy as np
import pytest


@pytest.mark.slow
def test_rendered_dataset_e2e(tmp_path):
    from xrslam_tpu.config import load_config
    from xrslam_tpu.eval import trajectory as traj
    from xrslam_tpu.io.dataset import load_euroc_groundtruth
    from xrslam_tpu.tools.make_dataset import render_dataset
    from xrslam_tpu.tools.run_dataset import run_sequence

    paths = render_dataset(str(tmp_path), n_frames=60, n_landmarks=500)
    cfg = load_config(paths["slam_yaml"], paths["device_yaml"])
    ts, qs, ps = run_sequence("euroc://" + paths["root"], cfg,
                              async_reader=False)

    assert len(ts) >= 20, f"tracked only {len(ts)} frames"
    gt_t, gt_p, _ = load_euroc_groundtruth(paths["root"])
    ia, ib = traj.associate(ts, gt_t)
    assert len(ia) >= 20
    ate = traj.ate_rmse(ps[ia], gt_p[ib])
    assert ate < 0.25, f"ATE {ate:.3f} m"

    # scale must be recovered (the degenerate-trajectory failure mode
    # collapses the estimated path to ~2% of truth)
    est_len = np.sum(np.linalg.norm(np.diff(ps, axis=0), axis=1))
    gt_len = np.sum(np.linalg.norm(np.diff(gt_p[ib], axis=0), axis=1))
    assert 0.6 * gt_len < est_len < 1.5 * gt_len, (est_len, gt_len)
