"""End-to-end pipeline tests (SURVEY.md §7 minimum slice + the RD-VIO
differentiators): synthetic sequences -> sample sync -> stub tracker ->
initializer -> sliding-window tracker -> trajectory ATE; plus the
dynamic-object PARSAC rejection and pure-rotation subframe scenes."""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core.detail import SyntheticTracker, VIOPipeline
from xrslam_tpu.eval.trajectory import ate_rmse
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import (
    bearings_of, bearings_of_points, circle_scene, euler_consistent,
    moving_object, wave_scene,
)


def _drive(cfg, scene, bearings, mask, C, tracker=None, hint_of=None):
    """Push the scene through a VIOPipeline; returns (pipe, est_t, est_p,
    no_translation_frames). `hint_of(frame, landmark)` remaps the
    synthetic track id (e.g. to churn tracks like a real tracker on a
    moving object)."""
    pipe = VIOPipeline(cfg, tracker or SyntheticTracker())
    n_frames = len(np.asarray(scene.t))
    ts = np.asarray(scene.t)
    imu_t = np.asarray(scene.imu_t)
    imu_w = np.asarray(scene.imu_w)
    imu_a = np.asarray(scene.imu_a)
    bearings = np.asarray(bearings)
    mask = np.asarray(mask)

    est_t, est_p, no_trans = [], [], []
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
            hint[slot] = hint_of(k, int(l)) if hint_of else l
        pipe.track_camera(float(ts[k]), kp, hint)
        if pipe.tracker_map.frames and pipe.tracker_map.frames[-1].no_translation:
            no_trans.append(k)

        if pipe.state == "tracking":
            t, q, p, v, bg, ba = pipe.swt.get_latest_state()
            est_t.append(t)
            est_p.append(p.copy())
    return pipe, np.asarray(est_t), (np.stack(est_p) if est_p else
                                     np.zeros((0, 3))), no_trans


def _ate_vs_gt(scene, est_t, est_p, **kw):
    ts = np.asarray(scene.t)
    gt_p = np.stack([np.asarray(scene.p[int(np.argmin(np.abs(ts - t)))])
                     for t in est_t])
    return ate_rmse(est_p, gt_p, **kw)


def _make_config(**kw):
    f = 450.0
    K = np.array([[f, 0.0, 376.0], [0.0, f, 240.0], [0.0, 0.0, 1.0]])
    q_bc = np.asarray(lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0], dtype=jnp.float64)))
    defaults = dict(
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
    defaults.update(kw)
    return Config(**defaults)


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

    pipe, est_t, est_p, _ = _drive(cfg, scene, bearings, mask, C=96)

    assert pipe.state == "tracking", "pipeline failed to initialize"
    assert len(est_p) >= 10

    err_se3 = _ate_vs_gt(scene, est_t, est_p)
    err_sim3 = _ate_vs_gt(scene, est_t, est_p, with_scale=True)
    # noise-free synthetic data: scale is observable from the IMU, so
    # even the SE3-aligned ATE must be small relative to the ~1.9 m of
    # trajectory covered
    assert err_sim3 < 0.05, (err_se3, err_sim3)
    assert err_se3 < 0.10, (err_se3, err_sim3)


@pytest.mark.slow
def test_pure_rotation_subframes_e2e():
    """RD-VIO differentiator #2: a mid-sequence pure-rotation span must
    be detected (FT_NO_TRANSLATION), absorbed as rotation subframes, and
    survived via the lift/merge machine + rotation-only refine_subwindow
    (reference sliding_window_tracker.cpp:145-223,370-465)."""
    cfg = _make_config()
    q_bc = jnp.asarray(cfg.camera_to_body_rotation)
    p_bc = jnp.asarray(cfg.camera_to_body_translation)
    # pause centered at t=2.4 s (frame 48), pure-rotation core ~frames
    # 43-53; initialization completes around frame 16
    scene = euler_consistent(wave_scene(n_frames=80, n_landmarks=96,
                                        pause=(2.4, 0.8)))
    bearings, mask = bearings_of(scene, q_bc, p_bc)

    tracker = SyntheticTracker(cfg)
    pipe, est_t, est_p, no_trans = _drive(cfg, scene, bearings, mask, C=96,
                                          tracker=tracker)

    assert pipe.state == "tracking", "pipeline lost tracking in rotation span"
    # the detector fired through the pause core...
    assert sum(1 for k in no_trans if 42 <= k <= 56) >= 3, no_trans
    # ...and anywhere else only at genuinely small per-frame translation
    # (the wave trajectory has natural reversal points, e.g. frame ~21,
    # which the reference's identical percentile check would also flag)
    speeds = np.linalg.norm(np.asarray(scene.v), axis=1)
    assert all(speeds[k] < 0.4 for k in no_trans), (
        [(k, round(float(speeds[k]), 3)) for k in no_trans])
    # the subframe machine exercised its rotation path
    st = pipe.swt.stats
    assert st["rotation_subframes"] >= 2, st
    assert st["subframe_lifts"] >= 1, st
    assert st["rotation_solves"] >= 1, st
    # no divergence through the rotation span
    err_sim3 = _ate_vs_gt(scene, est_t, est_p, with_scale=True)
    assert err_sim3 < 0.08, (err_sim3, st)


@pytest.mark.slow
def test_dynamic_object_parsac_e2e():
    """RD-VIO differentiator #1: a rigidly-moving object covering ~45%
    of the keypoints under pixel noise. With parsac_flag the IMU-PARSAC
    + 2D-2D PARSAC chain must un-static the object tracks and
    cross-propagate the tag to the tracker map, while leaving the
    static set intact (no ratchet) — the dynamic-rejection mechanics of
    reference sliding_window_tracker.cpp:578-790.

    On ATE we assert a *regression bound*, not strict improvement: on a
    clean synthetic (perfect association, exact IMU) the window's other
    defenses — keyframe-anchored refine filter, RPE revalidation,
    Cauchy loss — already neutralize the object, matching the
    reference's own published behavior where parsac ON slightly costs
    accuracy on static-world EuRoC (0.125 -> 0.136 avg,
    docs/en/benchmark.md:12-13) and pays off only on real dynamic
    footage (ADVIO 2.873 -> 2.671)."""
    base = _make_config()
    q_bc = jnp.asarray(base.camera_to_body_rotation)
    p_bc = jnp.asarray(base.camera_to_body_translation)
    scene = euler_consistent(wave_scene(n_frames=60, n_landmarks=96))
    n_static = 96
    obj = moving_object(scene, n_points=80, vel=(-0.12, 0.08, 0.03),
                        omega_obj=(0.0, 0.0, 0.2))
    pts = jnp.concatenate([
        jnp.broadcast_to(scene.landmarks, (scene.t.shape[0],) + scene.landmarks.shape),
        obj], axis=1)
    bearings, mask = bearings_of_points(scene.q, scene.p, pts, q_bc, p_bc)
    # 0.5 px observation noise so the PnP inlier/outlier split is
    # non-trivial
    rng = np.random.default_rng(11)
    bearings = np.asarray(bearings).copy()
    nz = rng.normal(0.0, 0.5 / 450.0, bearings[..., :2].shape)
    bearings[..., 0] += nz[..., 0] * bearings[..., 2]
    bearings[..., 1] += nz[..., 1] * bearings[..., 2]
    bearings /= np.linalg.norm(bearings, axis=-1, keepdims=True)
    C = n_static + 80

    def run(flag):
        cfg = _make_config(parsac_flag=flag,
                           parsac_dynamic_probability=0.2,
                           parsac_norm_scale=1.5,
                           window_landmark_slots=C,
                           init_landmark_slots=C)
        tracker = SyntheticTracker()
        pipe, est_t, est_p, _ = _drive(cfg, scene, bearings, mask, C=C,
                                       tracker=tracker)
        assert pipe.state == "tracking"
        return pipe, tracker, _ate_vs_gt(scene, est_t, est_p)

    pipe_on, tracker_on, ate_on = run(True)
    pipe_off, _, ate_off = run(False)

    # the chain fired: IMU-PARSAC separated the object, and the verdict
    # cross-propagated into the tracker map
    st = pipe_on.swt.stats
    assert st["tracks_unstatic"] >= 10, st
    obj_nonstatic = stat_static = 0
    obj_total = stat_total = 0
    for h, tid in tracker_on._id_map.items():
        tr = pipe_on.tracker_map.tracks.get(tid)
        if tr is None:
            continue
        if h >= n_static:
            obj_total += 1
            obj_nonstatic += (not tr.static)
        else:
            stat_total += 1
            stat_static += tr.static
    assert obj_total >= 10 and obj_nonstatic / obj_total > 0.5, (
        obj_nonstatic, obj_total)
    # statics must survive (the positive direction of the propagation
    # prevents one false rejection from ratcheting permanent)
    assert stat_total >= 20 and stat_static / stat_total > 0.6, (
        stat_static, stat_total)

    # accuracy guard: rejection must not cost more than the reference's
    # own parsac-on overhead ratio, and stays tight in absolute terms
    assert ate_on < 1.35 * ate_off + 1e-3, (ate_on, ate_off)
    assert ate_on < 0.15, (ate_on, ate_off)
