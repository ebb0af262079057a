"""Localizer-in-the-pipeline integration: the tracking loop queries a
MapLocalizer against a prebuilt global landmark map (reference queries
the XRLocalization server from the tracking state,
feature_tracker.cpp:116-121) and predict_pose applies the registered
SLAM->global transform to every output (detail.cpp:170-175)."""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core import nputil
from xrslam_tpu.core.detail import SyntheticTracker, VIOPipeline
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import bearings_of, wave_scene
from xrslam_tpu.localizer import SE3, MapLocalizer


def _make_config(**kw):
    f = 450.0
    K = np.array([[f, 0.0, 376.0], [0.0, f, 240.0], [0.0, 0.0, 1.0]])
    q_bc = np.asarray(lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0],
                                           dtype=jnp.float64)))
    defaults = dict(
        camera_intrinsic=K,
        camera_to_body_rotation=q_bc,
        camera_to_body_translation=np.array([0.02, -0.01, 0.03]),
        # the localizer anchors the transform at the OUTPUT (camera)
        # pose; make the output extrinsic the camera extrinsic
        output_to_body_rotation=q_bc,
        output_to_body_translation=np.array([0.02, -0.01, 0.03]),
        initializer_keyframe_gap=2,
        initializer_min_matches=30,
        initializer_min_triangulation=30,
        initializer_min_landmarks=20,
        window_landmark_slots=96,
        init_landmark_slots=96,
        sliding_window_force_keyframe_landmarks=20,
        visual_localization_enable=True,
    )
    defaults.update(kw)
    return Config(**defaults)


@pytest.mark.slow
def test_map_localizer_registers_global_frame():
    cfg = _make_config()
    n_frames = 40
    scene = wave_scene(n_frames=n_frames, n_landmarks=64)
    q_bc = jnp.asarray(cfg.camera_to_body_rotation)
    p_bc = jnp.asarray(cfg.camera_to_body_translation)
    bearings, mask = bearings_of(scene, q_bc, p_bc)
    bearings = np.asarray(bearings)
    mask = np.asarray(mask)
    lms = np.asarray(scene.landmarks)

    # the "global SfM map": the same world, expressed in a frame offset
    # by a known rigid transform
    T_g = SE3(np.asarray(nputil.quat_normalize(np.array([0.9, 0.1, -0.2, 0.3]))),
              np.array([5.0, -2.0, 1.5]))

    def matcher(frame):
        """Retrieval+matching stage of the localization server: GT 2D-3D
        correspondences for the frame, with the 3D points in the global
        frame."""
        hint = getattr(frame, "_hint", None)
        if hint is None:
            return None
        C = frame.bearings.shape[0]
        X = np.zeros((C, 3))
        x = np.zeros((C, 2))
        valid = np.zeros((C,), dtype=bool)
        for k in np.nonzero(hint >= 0)[0]:
            b = frame.bearings[k]
            if b[2] <= 1e-6:
                continue
            X[k] = T_g.apply(lms[int(hint[k])])
            x[k] = b[:2] / b[2]
            valid[k] = True
        return X, x, valid

    pipe = VIOPipeline(cfg, SyntheticTracker())
    pipe.set_localizer(MapLocalizer(cfg, matcher=matcher,
                                    query_interval=0.5))

    ts = np.asarray(scene.t)
    imu_t = np.asarray(scene.imu_t)
    imu_w = np.asarray(scene.imu_w)
    imu_a = np.asarray(scene.imu_a)
    C = 96
    outs = []
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
            out = pipe.predict_pose(float(ts[k]))
            if out is not None:
                outs.append((k, out))

    assert pipe.localizer.is_initialized(), \
        "tracking loop never registered the SLAM->global transform"

    # outputs after registration must land in the GLOBAL frame: compare
    # against the ground-truth body pose mapped through T_g
    errs = []
    for k, out in outs[-5:]:
        gt_p_global = T_g.apply(np.asarray(scene.p[k]))
        errs.append(np.linalg.norm(out.p - gt_p_global))
    assert np.median(errs) < 0.5, (errs, "outputs not in the global frame")
    # and they must NOT be in the SLAM frame anymore (offset is ~5.6 m)
    k, out = outs[-1]
    assert np.linalg.norm(out.p - np.asarray(scene.p[k])) > 1.0


def test_localizer_disabled_by_config():
    """visual_localization_enable=False must keep the query loop off
    even when a localizer object is installed."""
    cfg = _make_config(visual_localization_enable=False)
    pipe = VIOPipeline(cfg, SyntheticTracker())
    calls = []

    class Spy(MapLocalizer):
        def query_localization(self, *a, **k):
            calls.append(a)
            return False

    pipe.set_localizer(Spy(cfg, matcher=None))
    # no tracking yet -> nothing should query regardless
    pipe.track_gyroscope(0.0, np.zeros(3))
    assert calls == []
