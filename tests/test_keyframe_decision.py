"""Keyframe decision/action consistency: _keyframe_decision is the ONE
copy of the subframe/keyframe state machine's classification
(reference sliding_window_tracker.cpp:145-223) and manage_keyframe
consumes its verdict — these tests pin that the verdict matches the
mutation across randomized scenarios, and that the subwindow capacity
K_sub follows config instead of a hardcoded 11."""

import numpy as np

from xrslam_tpu.config import Config
from xrslam_tpu.core.map import FrameRec, PipelineMap, TrackRec
from xrslam_tpu.core.sliding_window import SlidingWindowTracker


def _frame(fid, t, n_kp=8, no_translation=False):
    return FrameRec(
        id=fid, t=t,
        q=np.array([1.0, 0, 0, 0]), p=np.zeros(3), v=np.zeros(3),
        bg=np.zeros(3), ba=np.zeros(3),
        q_bc=np.array([1.0, 0, 0, 0]), p_bc=np.zeros(3),
        q_bi=np.array([1.0, 0, 0, 0]), p_bi=np.zeros(3),
        K=np.eye(3), sqrt_inv_cov2=np.eye(2),
        bearings=np.tile(np.array([0, 0, 1.0]), (n_kp, 1)),
        track_ids=np.full((n_kp,), -1, dtype=np.int64),
        imu_t=np.zeros((0,)), imu_w=np.zeros((0, 3)), imu_a=np.zeros((0, 3)),
        no_translation=no_translation,
    )


def _swt(cfg, n_sub, sub_rot, new_rot, n_mapped):
    pmap = PipelineMap()
    swt = SlidingWindowTracker(pmap, cfg)
    kf = _frame(0, 0.0)
    kf.keyframe = True
    pmap.attach_frame(kf)
    for s in range(n_sub):
        kf.subframes.append(_frame(100 + s, 0.01 * (s + 1),
                                   no_translation=sub_rot))
    new_j = _frame(500, 1.0, n_kp=max(n_mapped, 1),
                   no_translation=new_rot)
    # give new_j n_mapped fully-mapped tracks
    for k in range(n_mapped):
        tr = TrackRec(id=k + 1)
        tr.valid = tr.triangulated = tr.static = True
        tr.p_w = np.array([0.0, 0.0, 5.0])
        tr.obs[new_j.id] = k
        new_j.track_ids[k] = tr.id
        pmap.tracks[tr.id] = tr
    pmap.attach_frame(new_j)
    return swt, pmap, kf, new_j


def test_decision_matches_action_randomized():
    rng = np.random.default_rng(0)
    cfg = Config(sliding_window_force_keyframe_landmarks=4)
    for _ in range(200):
        n_sub = int(rng.integers(0, 5))
        sub_rot = bool(rng.integers(0, 2))
        new_rot = bool(rng.integers(0, 2))
        n_mapped = int(rng.integers(0, 8))
        swt, pmap, kf, new_j = _swt(cfg, n_sub, sub_rot, new_rot, n_mapped)
        verdict = swt._keyframe_decision()
        is_kf = swt.manage_keyframe(verdict)
        case = (n_sub, sub_rot, new_rot, n_mapped, verdict)
        assert is_kf == (verdict != "subframe"), case
        if verdict == "subframe":
            # new_j attached as last subframe of kf
            assert pmap.frames == [kf], case
            assert kf.subframes[-1] is new_j, case
        elif verdict == "lift_translation":
            # lifted subframe is now the last keyframe; new_j its sub
            lifted = pmap.frames[-1]
            assert lifted.keyframe and lifted.subframes[-1] is new_j, case
        else:
            assert pmap.frames[-1] is new_j and new_j.keyframe, case
            if verdict == "lift_rotation":
                assert pmap.frames[-2].keyframe, case


def test_k_sub_follows_config():
    pmap = PipelineMap()
    for size in (1, 3, 6, 9, 12, 20):
        cfg = Config(sliding_window_subframe_size=size)
        swt = SlidingWindowTracker(pmap, cfg)
        # room for keyframe + every subframe the config allows (+slack)
        assert swt.K_sub >= 1 + size + 1, (size, swt.K_sub)
        # rotation merge bound also always fits
        assert swt.K_sub >= 1 + SlidingWindowTracker.ROT_MERGE_TRIGGER, size
    # default config reproduces the round-3 capacity (no regression)
    assert SlidingWindowTracker(pmap, Config()).K_sub == 11
