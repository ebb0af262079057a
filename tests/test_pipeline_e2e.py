"""End-to-end pipeline test (SURVEY.md §7 minimum slice): synthetic
circle sequence -> sample sync -> stub tracker -> initializer ->
sliding-window tracker -> trajectory ATE."""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core.detail import SyntheticTracker, VIOPipeline
from xrslam_tpu.eval.trajectory import ate_rmse
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import bearings_of, circle_scene, euler_consistent


def _make_config():
    f = 450.0
    K = np.array([[f, 0.0, 376.0], [0.0, f, 240.0], [0.0, 0.0, 1.0]])
    q_bc = np.asarray(lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0], dtype=jnp.float64)))
    return Config(
        camera_intrinsic=K,
        camera_to_body_rotation=q_bc,
        camera_to_body_translation=np.array([0.02, -0.01, 0.03]),
        initializer_keyframe_gap=2,
        initializer_min_matches=30,
        initializer_min_triangulation=30,
        initializer_min_landmarks=20,
        window_landmark_slots=96,
        init_landmark_slots=96,
        sliding_window_force_keyframe_landmarks=20,
    )


@pytest.mark.slow
def test_synthetic_sequence_e2e():
    cfg = _make_config()
    n_frames = 40
    # omega=0.25 keeps the first/last-keyframe distance under 1 m so the
    # initializer's reference scale gate (0.001 < s < 1.0,
    # initializer.cpp:234-238) accepts the SfM scale
    scene = euler_consistent(circle_scene(n_frames=n_frames, n_landmarks=64, omega=0.25))
    q_bc = jnp.asarray(cfg.camera_to_body_rotation)
    p_bc = jnp.asarray(cfg.camera_to_body_translation)
    bearings, mask = bearings_of(scene, q_bc, p_bc)
    bearings = np.asarray(bearings)
    mask = np.asarray(mask)

    pipe = VIOPipeline(cfg, SyntheticTracker())

    C = 96  # keypoint capacity
    ts = np.asarray(scene.t)
    imu_t = np.asarray(scene.imu_t)
    imu_w = np.asarray(scene.imu_w)
    imu_a = np.asarray(scene.imu_a)

    est_t, est_p = [], []
    for k in range(n_frames):
        # push the IMU samples of interval [t_k, t_{k+1}) BEFORE the
        # frame at t_k+... (frame at ts[k] needs samples <= ts[k])
        if k > 0:
            for s in range(imu_t.shape[1]):
                t = float(imu_t[k - 1, s])
                pipe.track_gyroscope(t, imu_w[k - 1, s])
                pipe.track_accelerometer(t, imu_a[k - 1, s])
            # one extra gyro past the frame time so interpolation closes
        # a sample exactly at the frame time
        pipe.track_gyroscope(float(ts[k]) + 1e-6, imu_w[min(k, n_frames - 2), 0])
        pipe.track_accelerometer(float(ts[k]) + 1e-6, imu_a[min(k, n_frames - 2), 0])

        kp = np.zeros((C, 3))
        kp[:, 2] = 1.0
        hint = np.full((C,), -1, dtype=np.int64)
        vis = np.nonzero(mask[k])[0][:C]
        for slot, l in enumerate(vis):
            kp[slot] = bearings[k, l]
            hint[slot] = l
        pipe.track_camera(float(ts[k]), kp, hint)

        if pipe.state == "tracking":
            t, q, p, v, bg, ba = pipe.swt.get_latest_state()
            est_t.append(t)
            est_p.append(p.copy())

    assert pipe.state == "tracking", "pipeline failed to initialize"
    assert len(est_p) >= 10

    # associate estimated frames to GT by timestamp
    est_t = np.asarray(est_t)
    est_p = np.stack(est_p)
    gt_p = []
    for t in est_t:
        i = int(np.argmin(np.abs(ts - t)))
        gt_p.append(np.asarray(scene.p[i]))
    gt_p = np.stack(gt_p)

    err_se3 = ate_rmse(est_p, gt_p)
    err_sim3 = ate_rmse(est_p, gt_p, with_scale=True)
    # noise-free synthetic data: scale is observable from the IMU, so
    # even the SE3-aligned ATE must be small relative to the ~1.9 m of
    # trajectory covered
    assert err_sim3 < 0.05, (err_se3, err_sim3)
    assert err_se3 < 0.10, (err_se3, err_sim3)
