"""Depth-camera input (XRSLAM_SENSOR_DEPTH_CAMERA, XRSLAM.h:22,56-60).

The reference declares the depth sensor in its C ABI but its dispatcher
drops the data on the floor (XRSLAMInternal.cpp:36-41); here the stream
is consumed: keypoint depths seed landmark positions directly
(window_builder.triangulate_track), and the initializer's monocular
SfM is rescaled to metric from measured depths (initializer.init_sfm).
"""

import numpy as np
import pytest

from xrslam_tpu import api
from xrslam_tpu.core import nputil
from xrslam_tpu.core.map import FrameRec, PipelineMap
from xrslam_tpu.core.window_builder import triangulate_track


def _frame(fid, t, q, p, kp_depth=None, C=4):
    f = FrameRec(
        id=fid, t=t, q=np.asarray(q, float), p=np.asarray(p, float),
        v=np.zeros(3), bg=np.zeros(3), ba=np.zeros(3),
        q_bc=np.array([1.0, 0, 0, 0]), p_bc=np.zeros(3),
        q_bi=np.array([1.0, 0, 0, 0]), p_bi=np.zeros(3),
        K=np.array([[260.0, 0, 160], [0, 260.0, 120], [0, 0, 1]]),
        sqrt_inv_cov2=np.eye(2),
        bearings=np.zeros((C, 3)), track_ids=np.full((C,), -1, np.int64),
        kp_depth=kp_depth,
    )
    return f


def test_depth_seeds_single_observation_track():
    """One observation + depth fully determines the landmark; DLT would
    refuse (< 2 views)."""
    X = np.array([0.4, -0.2, 3.0])  # camera-frame point (frame at origin)
    b = X / np.linalg.norm(X)
    kd = np.zeros(4)
    kd[1] = X[2]  # measured z-depth
    f = _frame(0, 0.0, [1, 0, 0, 0], [0, 0, 0], kp_depth=kd)
    f.bearings[1] = b
    f.track_ids[1] = 7

    class Tr:
        obs = {0: 1}

    p = triangulate_track(Tr(), {0: f})
    assert p is not None
    np.testing.assert_allclose(p, X, rtol=1e-9)


def test_depth_seed_uses_camera_pose():
    """The seed must go through the frame's camera pose, not identity."""
    q = nputil.expmap(np.array([0.0, 0.3, 0.1]))
    pw = np.array([1.0, -2.0, 0.5])
    Xc = np.array([-0.1, 0.2, 2.5])
    kd = np.zeros(4)
    kd[0] = Xc[2]
    f = _frame(3, 0.0, q, pw, kp_depth=kd)
    f.bearings[0] = Xc / np.linalg.norm(Xc)
    f.track_ids[0] = 1

    class Tr:
        obs = {3: 0}

    p = triangulate_track(Tr(), {3: f})
    expected = nputil.quat_rotate(q, Xc) + pw  # q_bc = identity
    np.testing.assert_allclose(p, expected, rtol=1e-9)


def test_api_accepts_depth_sensor():
    slam = api.XRSLAM()
    d16 = np.full((240, 320), 2500, np.uint16)  # 2.5 m in millimeters
    slam.push_sensor_data(api.SensorType.DEPTH_CAMERA, 0.05, d16)
    assert slam._cur_depth is not None
    t, d = slam._cur_depth
    assert d.dtype == np.float32 and abs(float(d[0, 0]) - 2.5) < 1e-6


def test_clone_copies_kp_depth():
    kd = np.array([1.0, 0.0, 2.0, 0.0])
    f = _frame(0, 0.0, [1, 0, 0, 0], [0, 0, 0], kp_depth=kd)
    g = f.clone_shallow()
    assert g.kp_depth is not None and g.kp_depth is not f.kp_depth
    np.testing.assert_array_equal(g.kp_depth, kd)


@pytest.mark.slow
def test_depth_e2e_metric_init(tmp_path):
    """Full drive of a rendered sequence WITH aligned depth images: the
    pipeline must initialize and track at least as well as the
    monocular drive of the same scene (tests/test_image_e2e.py), with
    the init made metric by the depth rescale."""
    from xrslam_tpu.config import load_config
    from xrslam_tpu.eval import trajectory as traj
    from xrslam_tpu.io.dataset import load_euroc_groundtruth
    from xrslam_tpu.tools.make_dataset import render_dataset
    from xrslam_tpu.tools.run_dataset import run_sequence

    paths = render_dataset(str(tmp_path), n_frames=60, n_landmarks=500,
                           with_depth=True)
    cfg = load_config(paths["slam_yaml"], paths["device_yaml"])
    ts, qs, ps = run_sequence("euroc://" + paths["root"], cfg,
                              async_reader=False)
    assert len(ts) >= 20, f"only {len(ts)} frames tracked"
    gt_t, gt_p, _ = load_euroc_groundtruth(paths["root"])
    ia, ib = traj.associate(ts, gt_t)
    ate = traj.ate_rmse(ps[ia], gt_p[ib])
    assert ate < 0.25, f"ATE {ate:.3f} m"
    # scale recovered (and no collapsed-scale init)
    span_est = np.ptp(ps[ia], axis=0).max()
    span_gt = np.ptp(gt_p[ib], axis=0).max()
    assert span_est > 0.5 * span_gt
