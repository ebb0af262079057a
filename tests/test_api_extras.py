"""Tests for the public API surface, localizer transform math, AR
anchoring, and inspection/timing utilities."""

import numpy as np
import pytest

from xrslam_tpu import api
from xrslam_tpu.ar import VirtualObjectManager
from xrslam_tpu.config import Config
from xrslam_tpu.core import nputil
from xrslam_tpu.core.map import FrameRec, PipelineMap, TrackRec
from xrslam_tpu.localizer import SE3, MapLocalizer, ScreenState
from xrslam_tpu.utils import inspection
from xrslam_tpu.utils.timing import reset_timings, stage_timer, timings


def test_api_lifecycle_and_results():
    slam = api.create(config=Config())
    # before any data: identity pose, initializing state
    assert api.get_result(api.ResultType.STATE) == api.State.INITIALIZING
    pose = api.get_result(api.ResultType.BODY_POSE)
    assert pose.timestamp == 0.0
    K = api.get_result(api.ResultType.INTRINSICS)
    assert set(K) == {"fx", "fy", "cx", "cy"}
    assert isinstance(api.get_result(api.ResultType.VERSION), str)
    assert api.get_result(api.ResultType.LANDMARKS).shape == (0, 3)
    bias = api.get_result(api.ResultType.BIAS)
    assert np.allclose(bias.acc_bias, 0) and np.allclose(bias.gyr_bias, 0)

    # push IMU — must be accepted and not crash
    for i in range(10):
        t = 0.005 * i
        api.push_sensor_data(api.SensorType.GYROSCOPE, t, np.zeros(3))
        api.push_sensor_data(api.SensorType.ACCELERATION, t,
                             np.array([0.0, 0.0, 9.80665]))
    with pytest.raises(ValueError):
        api.push_sensor_data(api.SensorType.GRAVITY, 0.0, np.zeros(3))
    api.destroy()
    assert api._instance is None


def test_pose_composition_matches_manual():
    """Body/camera pose output composes extrinsics the way
    XRSLAMManager.cpp:156-186 does."""
    cfg = Config(
        camera_to_body_rotation=nputil.expmap(np.array([0.0, 0.3, 0.0])),
        camera_to_body_translation=np.array([0.1, -0.2, 0.05]),
        imu_to_body_rotation=nputil.expmap(np.array([0.1, 0.0, 0.0])),
        imu_to_body_translation=np.array([0.0, 0.01, 0.0]),
    )
    slam = api.XRSLAM(config=cfg)

    class FakeOut:
        t = 1.5
        q = nputil.expmap(np.array([0.0, 0.0, 0.7]))
        p = np.array([1.0, 2.0, 3.0])

    slam._last_output = FakeOut()
    body = slam.get_result(api.ResultType.BODY_POSE)
    cam = slam.get_result(api.ResultType.CAMERA_POSE)

    q_exp = nputil.quat_mul(FakeOut.q, cfg.imu_to_body_rotation)
    p_exp = FakeOut.p + nputil.quat_rotate(FakeOut.q, cfg.imu_to_body_translation)
    assert np.allclose(body.quaternion, [q_exp[1], q_exp[2], q_exp[3], q_exp[0]])
    assert np.allclose(body.translation, p_exp)

    q_exp = nputil.quat_mul(FakeOut.q, cfg.camera_to_body_rotation)
    assert np.allclose(cam.quaternion, [q_exp[1], q_exp[2], q_exp[3], q_exp[0]])


# ---------------------------------------------------------------------------
# localizer
# ---------------------------------------------------------------------------

def _rand_se3(rng):
    return SE3(nputil.quat_normalize(rng.normal(size=4)), rng.normal(size=3))


def test_se3_algebra():
    rng = np.random.default_rng(3)
    T = _rand_se3(rng)
    I = T @ T.inverse()
    assert np.allclose(I.p, 0, atol=1e-12)
    assert np.isclose(abs(I.q[0]), 1.0)


def test_map_localizer_recovers_transform():
    """Feed the localizer PnP correspondences expressed in a global
    frame offset from SLAM by a known SE3; the recovered slam_to_global
    must map SLAM poses onto global ones."""
    rng = np.random.default_rng(7)
    # ground-truth slam->global
    T_gs = SE3(nputil.quat_normalize(np.array([0.9, 0.1, -0.2, 0.3])),
               np.array([5.0, -2.0, 1.0]))

    # SLAM-frame body pose (output==body: q_bo = identity)
    q_sb = nputil.quat_normalize(np.array([0.8, 0.0, 0.4, 0.2]))
    p_sb = np.array([0.5, 0.2, -0.1])

    # world points in the SLAM frame, in front of the camera
    Xs = rng.uniform(-1, 1, (60, 3)) + np.array([0, 0, 4.0])
    Xw_slam = np.stack([nputil.quat_rotate(q_sb, x) + p_sb for x in Xs])
    Xw_global = np.stack([T_gs.apply(x) for x in Xw_slam])
    x_norm = Xs[:, :2] / Xs[:, 2:3]

    def matcher(_):
        return Xw_global, x_norm, np.ones(len(Xs), dtype=bool)

    loc = MapLocalizer(config=Config(), matcher=matcher, query_interval=0.0)
    ok = loc.query_localization(10.0, None, q_sb, p_sb)
    assert ok and loc.is_initialized()

    q_out, p_out = loc.transform(q_sb, p_sb)
    p_expect = T_gs.apply(p_sb)
    assert np.allclose(p_out, p_expect, atol=1e-3)
    q_expect = nputil.quat_mul(T_gs.q, q_sb)
    dq = nputil.quat_mul(nputil.quat_conj(q_expect), q_out)
    assert abs(abs(dq[0]) - 1.0) < 1e-5


def test_localizer_throttle():
    calls = []

    def matcher(_):
        calls.append(1)
        return None

    loc = MapLocalizer(config=Config(), matcher=matcher, query_interval=3.0)
    loc.query_localization(0.0, None, np.array([1.0, 0, 0, 0]), np.zeros(3))
    loc.query_localization(1.0, None, np.array([1.0, 0, 0, 0]), np.zeros(3))
    loc.query_localization(4.0, None, np.array([1.0, 0, 0, 0]), np.zeros(3))
    assert len(calls) == 2  # t=1.0 throttled (interval 3s)
    loc.query_frame()
    loc.query_localization(4.5, None, np.array([1.0, 0, 0, 0]), np.zeros(3))
    assert len(calls) == 3  # query_frame forces through


# ---------------------------------------------------------------------------
# AR virtual objects
# ---------------------------------------------------------------------------

def _frame_at(p_wc, capacity=32):
    return FrameRec(
        id=1, t=0.0,
        q=np.array([1.0, 0, 0, 0]), p=np.asarray(p_wc, float),
        v=np.zeros(3), bg=np.zeros(3), ba=np.zeros(3),
        q_bc=np.array([1.0, 0, 0, 0]), p_bc=np.zeros(3),
        q_bi=np.array([1.0, 0, 0, 0]), p_bi=np.zeros(3),
        K=np.eye(3), sqrt_inv_cov2=np.eye(2),
        bearings=np.zeros((capacity, 3)),
        track_ids=np.full((capacity,), -1, dtype=np.int64),
    )


def test_virtual_object_anchoring():
    pmap = PipelineMap()
    frame = _frame_at([0.0, 0.0, 0.0])
    # landmarks straight ahead (camera +z), near image center
    rng = np.random.default_rng(0)
    pts = rng.uniform(-0.2, 0.2, (8, 3)) + np.array([0, 0, 5.0])
    for i, pw in enumerate(pts):
        b = pw / np.linalg.norm(pw)
        frame.bearings[i] = b
        tr = TrackRec(id=100 + i, p_w=pw, triangulated=True, valid=True)
        tr.obs[frame.id] = i
        frame.track_ids[i] = tr.id
        pmap.tracks[tr.id] = tr
    pmap.attach_frame(frame)

    mgr = VirtualObjectManager(pmap)
    oid = mgr.create_virtual_object()
    assert oid > 0
    obj = mgr.get_virtual_object_pose(oid)
    assert np.allclose(obj.p, pts.mean(axis=0), atol=1e-12)
    R = nputil.quat_to_matrix(obj.q)
    assert np.allclose(R.T @ R, np.eye(3), atol=1e-9)
    assert np.isclose(np.linalg.det(R), 1.0)
    # column 0 is -up (reference :47-50)
    assert np.allclose(R[:, 0], [0, 0, -1.0], atol=1e-9)

    # too few landmarks → -1
    pmap2 = PipelineMap()
    f2 = _frame_at([0.0, 0.0, 0.0])
    pmap2.attach_frame(f2)
    assert VirtualObjectManager(pmap2).create_virtual_object() == -1


# ---------------------------------------------------------------------------
# inspection/timing
# ---------------------------------------------------------------------------

def test_inspection_slots_and_timers():
    inspection.InspectionSupport.clear()
    got = []
    inspection.InspectionSupport.subscribe("foo", got.append)
    inspection.inspect("foo", 42)
    assert inspection.inspect_get("foo") == 42 and got == [42]

    reset_timings()
    with stage_timer("stage_a"):
        pass
    with stage_timer("stage_a"):
        pass
    t = timings()
    assert "stage_a" in t and t["stage_a"] >= 0.0
