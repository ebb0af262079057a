"""Checkpoint/resume: a pipeline saved mid-sequence and restored must
produce the same downstream trajectory as the uninterrupted run."""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core.detail import SyntheticTracker, VIOPipeline
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import bearings_of, circle_scene, euler_consistent
from xrslam_tpu.utils.checkpoint import (
    load_pipeline, load_tree, save_pipeline, save_tree,
)


def test_tree_roundtrip(tmp_path):
    tree = {
        "a": np.arange(6).reshape(2, 3).astype(np.float64),
        "b": [1, 2.5, None, "hi", True],
        "nested": {"x": jnp.ones((3,)), 7: np.array([1, 2], dtype=np.int64)},
        "empty": [],
    }
    p = str(tmp_path / "t.npz")
    save_tree(p, tree)
    out = load_tree(p)
    assert np.array_equal(out["a"], tree["a"])
    assert out["b"] == [1, 2.5, None, "hi", True]
    assert np.allclose(out["nested"]["x"], 1.0)
    assert np.array_equal(out["nested"][7], [1, 2])
    assert out["empty"] == []


def _make_config():
    f = 450.0
    K = np.array([[f, 0.0, 376.0], [0.0, f, 240.0], [0.0, 0.0, 1.0]])
    q_bc = np.asarray(lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0],
                                           dtype=jnp.float64)))
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


def _scene_inputs(cfg, n_frames):
    scene = euler_consistent(
        circle_scene(n_frames=n_frames, n_landmarks=64, omega=0.25))
    bearings, mask = bearings_of(scene, jnp.asarray(cfg.camera_to_body_rotation),
                                 jnp.asarray(cfg.camera_to_body_translation))
    return (scene, np.asarray(bearings), np.asarray(mask),
            np.asarray(scene.t), np.asarray(scene.imu_t),
            np.asarray(scene.imu_w), np.asarray(scene.imu_a))


def _drive(pipe, inputs, k0, k1, n_frames, C=96):
    scene, bearings, mask, ts, imu_t, imu_w, imu_a = inputs
    outs = []
    for k in range(k0, k1):
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
        for slot, lm in enumerate(vis):
            kp[slot] = bearings[k, lm]
            hint[slot] = lm
        pipe.track_camera(float(ts[k]), kp, hint)
        if pipe.state == "tracking":
            t, q, p, v, bg, ba = pipe.swt.get_latest_state()
            outs.append((t, np.asarray(p).copy()))
    return outs


@pytest.mark.slow
def test_checkpoint_resume_equivalence(tmp_path):
    cfg = _make_config()
    n = 40
    inputs = _scene_inputs(cfg, n)
    cut = 30

    # run A: straight through
    pa = VIOPipeline(cfg, SyntheticTracker())
    outs_a = _drive(pa, inputs, 0, n, n)
    assert pa.swt is not None

    # run B: same prefix, checkpoint, restore into a fresh pipeline,
    # finish the sequence there
    pb = VIOPipeline(cfg, SyntheticTracker())
    _drive(pb, inputs, 0, cut, n)
    assert pb.swt is not None
    ckpt = str(tmp_path / "state.npz")
    save_pipeline(ckpt, pb)

    tr = SyntheticTracker()
    # the synthetic tracker's hint→track mapping is tracker-local state;
    # carry it over (a real KLT tracker re-detects instead)
    tr._id_map = dict(pb.tracker._id_map)
    pc = load_pipeline(ckpt, cfg, tr)
    outs_c = _drive(pc, inputs, cut, n, n)

    t_cut = float(np.asarray(inputs[3])[cut - 1])
    tail_a = [p for (t, p) in outs_a if t > t_cut]
    assert len(outs_c) > 0 and len(tail_a) > 0
    m = min(len(tail_a), len(outs_c))
    err = np.linalg.norm(
        np.asarray(tail_a[-m:]) - np.asarray([p for _, p in outs_c[-m:]]),
        axis=1)
    assert err.max() < 1e-6, err.max()
