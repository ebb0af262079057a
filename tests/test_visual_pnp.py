"""Camera-rate visual PnP pose path (SURVEY.md §3.4: the reference's
iOS-only high-rate path, feature_tracker.cpp:95-112 synchronize_keymap /
attach_latest_frame / solve_pnp) + backend decimation via
sliding_window_tracker_frequent (feature_tracker.cpp:47-49).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core.detail import SyntheticTracker, VIOPipeline
from xrslam_tpu.eval.trajectory import ate_rmse
from xrslam_tpu.geometry import lie
from xrslam_tpu.ransac import pnp as pnp_mod
from xrslam_tpu.io.synthetic import bearings_of, euler_consistent, wave_scene


def test_refine_pose_pnp_recovers_pose():
    """Pose-only robust GN converges from a perturbed prior with 10%
    outliers (the Cauchy(1.0) IRLS analog of the reference's
    reprojection-prior solve, solver.cpp:36)."""
    rng = np.random.default_rng(3)
    N = 64
    X = rng.uniform(-2, 2, (N, 3))
    X[:, 2] += 6.0
    q_true = np.asarray(lie.quat_normalize(jnp.asarray([0.9, 0.1, -0.2, 0.15])))
    p_true = np.array([0.3, -0.2, 0.5])
    R = np.asarray(lie.quat_to_matrix(jnp.asarray(q_true)))
    y = (X - p_true) @ R
    b = y / np.linalg.norm(y, axis=1, keepdims=True)
    valid = np.ones(N, bool)
    valid[50:] = False
    b[45:50] = rng.normal(size=(5, 3))
    b[45:50] /= np.linalg.norm(b[45:50], axis=1, keepdims=True)
    W = np.diag([450.0 / np.sqrt(0.5)] * 2)
    q0 = np.asarray(lie.quat_normalize(lie.quat_mul(
        jnp.asarray(q_true), lie.expmap(jnp.asarray([0.05, -0.03, 0.04])))))
    p0 = p_true + np.array([0.1, -0.08, 0.12])
    q, p = pnp_mod.refine_pose_pnp(
        jnp.asarray(q0), jnp.asarray(p0), jnp.asarray(X), jnp.asarray(b),
        jnp.asarray(valid), jnp.asarray(W), iters=10)
    ang = 2 * np.arccos(np.clip(abs(np.dot(np.asarray(q), q_true)), -1, 1))
    assert np.degrees(ang) < 0.01
    assert np.linalg.norm(np.asarray(p) - p_true) < 1e-3


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
        visual_pnp_enable=True,
        sliding_window_tracker_frequent=2,
    )


@pytest.mark.slow
def test_pipeline_highrate_pnp_with_decimated_backend():
    """With the backend running every 2nd frame, the camera-rate PnP
    path must publish a pose at EVERY frame's timestamp and the
    full-rate trajectory must stay accurate."""
    cfg = _make_config()
    n_frames = 44
    scene = euler_consistent(wave_scene(n_frames=n_frames, n_landmarks=64))
    q_bc = jnp.asarray(cfg.camera_to_body_rotation)
    p_bc = jnp.asarray(cfg.camera_to_body_translation)
    bearings = np.asarray(bearings_of(scene, q_bc, p_bc)[0])
    mask = np.asarray(bearings_of(scene, q_bc, p_bc)[1])

    pipe = VIOPipeline(cfg, SyntheticTracker())
    C = 96
    ts = np.asarray(scene.t)
    imu_t = np.asarray(scene.imu_t)
    imu_w = np.asarray(scene.imu_w)
    imu_a = np.asarray(scene.imu_a)

    est_t, est_p, pnp_frames = [], [], 0
    for k in range(n_frames):
        if k > 0:
            for s in range(imu_t.shape[1]):
                t = float(imu_t[k - 1, s])
                pipe.track_gyroscope(t, imu_w[k - 1, s])
                pipe.track_accelerometer(t, imu_a[k - 1, s])
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
            # camera-rate output: the latest propagated/PnP state must
            # sit at this frame's time even on non-issued frames
            assert pipe._prop is not None
            est_t.append(float(ts[k]))
            est_p.append(pipe._prop["p"].copy())
            if abs(pipe._prop["t"] - float(ts[k])) < 1e-9:
                pnp_frames += 1

    assert pipe.state == "tracking", "pipeline failed to initialize"
    assert len(est_p) >= 10
    # the keymap PnP must actually have fired (on at least the
    # non-issued half of the frames)
    assert pnp_frames >= len(est_p) // 2, pnp_frames

    est_t = np.asarray(est_t)
    est_p = np.stack(est_p)
    gt_p = np.stack([np.asarray(scene.p[int(np.argmin(np.abs(ts - t)))])
                     for t in est_t])
    err_sim3 = ate_rmse(est_p, gt_p, with_scale=True)
    err_se3 = ate_rmse(est_p, gt_p)
    assert err_sim3 < 0.08, (err_se3, err_sim3)
    assert err_se3 < 0.15, (err_se3, err_sim3)
