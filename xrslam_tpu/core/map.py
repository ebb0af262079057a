"""Host-side map store: frames, tracks, tags — the pipeline's mutable
bookkeeping around the jitted compute kernels.

Mirrors the reference's Map/Frame/Track semantics (reference:
xrslam/src/xrslam/map/{map,frame,track}.{h,cpp}) with array-based
storage: a frame's keypoints are a fixed-capacity bearing array plus an
int track-id array (-1 = empty slot) instead of pointer lists. All
numerics that touch the optimizer go through fixed-shape window arrays
(window_builder.py); this store only orchestrates.

Landmarks are stored as world points plus flags; the solver-side
inverse-depth parameterization (anchored at the first observation,
reference map/track.cpp:90-101) is computed at window-extraction time
and written back after each solve.
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

_track_id_counter = itertools.count(1)
_frame_id_counter = itertools.count(1)


@dataclass
class TrackRec:
    """A landmark track (reference map/track.h:23-81)."""

    id: int
    obs: Dict[int, int] = field(default_factory=dict)  # frame_id -> kp idx
    p_w: Optional[np.ndarray] = None  # world point (when triangulated)
    valid: bool = False
    triangulated: bool = False
    static: bool = True
    outlier: bool = False
    trash: bool = False
    life: int = 0

    def first_frame_id(self) -> int:
        return min(self.obs)

    def all_tagged(self, *names) -> bool:
        return all(getattr(self, n) for n in names)


@dataclass
class FrameRec:
    """A frame (reference map/frame.h:24-82): body(center) states,
    camera/imu extrinsics, fixed-capacity keypoints, raw IMU samples of
    the interval ending at this frame."""

    id: int
    t: float
    # body(center) state
    q: np.ndarray  # (4,) [w,x,y,z] body-to-world
    p: np.ndarray  # (3,)
    v: np.ndarray
    bg: np.ndarray
    ba: np.ndarray
    # extrinsics (sensor-to-body)
    q_bc: np.ndarray
    p_bc: np.ndarray
    q_bi: np.ndarray
    p_bi: np.ndarray
    K: np.ndarray                 # (3,3) intrinsics
    sqrt_inv_cov2: np.ndarray     # (2,2) keypoint noise weight
    # keypoints
    bearings: np.ndarray          # (C,3) unit bearings, camera frame
    track_ids: np.ndarray         # (C,) int64, -1 = empty
    # raw IMU samples covering (t_prev, t]
    imu_t: np.ndarray = field(default_factory=lambda: np.zeros((0,)))
    imu_w: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    imu_a: np.ndarray = field(default_factory=lambda: np.zeros((0, 3)))
    # tags (reference map/frame.h:17-22)
    keyframe: bool = False
    no_translation: bool = False
    fix_pose: bool = False
    fix_motion: bool = False
    subframes: List["FrameRec"] = field(default_factory=list)
    # per-keypoint metric z-depth (meters, 0 = no measurement) sampled
    # from an aligned depth image (XRSLAMDepthImage, XRSLAM.h:56-60 —
    # declared in the reference ABI but dropped by its dispatcher,
    # XRSLAMInternal.cpp:36-41; we actually consume it)
    kp_depth: "Optional[np.ndarray]" = None

    def n_keypoints(self) -> int:
        return int((self.track_ids >= 0).sum())

    def camera_pose(self):
        """(q_wc, p_wc) — reference Frame::get_pose(camera)."""
        from . import nputil

        q_wc = nputil.quat_mul(self.q, self.q_bc)
        p_wc = self.p + nputil.quat_rotate(self.q, self.p_bc)
        return q_wc, p_wc

    def clone_shallow(self) -> "FrameRec":
        return FrameRec(
            id=self.id, t=self.t,
            q=self.q.copy(), p=self.p.copy(), v=self.v.copy(),
            bg=self.bg.copy(), ba=self.ba.copy(),
            q_bc=self.q_bc, p_bc=self.p_bc, q_bi=self.q_bi, p_bi=self.p_bi,
            K=self.K, sqrt_inv_cov2=self.sqrt_inv_cov2,
            bearings=self.bearings.copy(), track_ids=self.track_ids.copy(),
            imu_t=self.imu_t.copy(), imu_w=self.imu_w.copy(), imu_a=self.imu_a.copy(),
            keyframe=self.keyframe, no_translation=self.no_translation,
            kp_depth=None if self.kp_depth is None else self.kp_depth.copy(),
        )


class PipelineMap:
    """Ordered frame list + track pool (reference map/map.h:14-76)."""

    def __init__(self):
        self.frames: List[FrameRec] = []
        self.tracks: Dict[int, TrackRec] = {}

    # ---- frames ----
    def attach_frame(self, frame: FrameRec, position: Optional[int] = None):
        if position is None:
            self.frames.append(frame)
        else:
            self.frames.insert(position, frame)
        self._index_tracks_of(frame)

    def detach_frame(self, index: int) -> FrameRec:
        frame = self.frames.pop(index)
        self._unindex_tracks_of(frame)
        return frame

    def untrack_frame(self, frame: FrameRec):
        """Remove the frame's observations but keep the frame object
        (reference Map::untrack_frame)."""
        self._unindex_tracks_of(frame)
        frame.track_ids = np.full_like(frame.track_ids, -1)

    def erase_frame(self, index: int):
        self.detach_frame(index)

    def frame_index_by_id(self, fid: int) -> Optional[int]:
        for i, f in enumerate(self.frames):
            if f.id == fid:
                return i
        return None

    # ---- tracks ----
    def get_track(self, frame: FrameRec, k: int, create: bool = False) -> Optional[TrackRec]:
        tid = int(frame.track_ids[k])
        if tid >= 0:
            return self.tracks.get(tid)
        if not create:
            return None
        tid = next(_track_id_counter)
        tr = TrackRec(id=tid)
        tr.obs[frame.id] = k
        frame.track_ids[k] = tid
        self.tracks[tid] = tr
        return tr

    def add_observation(self, track: TrackRec, frame: FrameRec, k: int):
        track.obs[frame.id] = k
        frame.track_ids[k] = track.id

    def remove_observation(self, track: TrackRec, frame: FrameRec):
        """reference Track::remove_keypoint — landmark world point is
        kept (we store p_w directly so re-anchoring is implicit)."""
        k = track.obs.pop(frame.id, None)
        if k is not None and frame.track_ids[k] == track.id:
            frame.track_ids[k] = -1
        if not track.obs:
            track.valid = False
            self.tracks.pop(track.id, None)

    def prune_tracks(self, predicate):
        for tid in [t.id for t in self.tracks.values() if predicate(t)]:
            self.erase_track(tid)

    def erase_track(self, tid: int):
        tr = self.tracks.pop(tid, None)
        if tr is None:
            return
        frames_by_id = {f.id: f for f in self.all_frames()}
        for fid, k in tr.obs.items():
            f = frames_by_id.get(fid)
            if f is not None and f.track_ids[k] == tid:
                f.track_ids[k] = -1

    # ---- helpers ----
    def all_frames(self):
        for f in self.frames:
            yield f
            yield from f.subframes

    def bearing_of(self, track: TrackRec, frame: FrameRec) -> np.ndarray:
        return frame.bearings[track.obs[frame.id]]

    def _index_tracks_of(self, frame: FrameRec):
        for k in np.nonzero(frame.track_ids >= 0)[0]:
            tid = int(frame.track_ids[k])
            if tid in self.tracks:
                self.tracks[tid].obs[frame.id] = int(k)

    def _unindex_tracks_of(self, frame: FrameRec):
        for k in np.nonzero(frame.track_ids >= 0)[0]:
            tid = int(frame.track_ids[k])
            tr = self.tracks.get(tid)
            if tr is not None:
                tr.obs.pop(frame.id, None)
                if not tr.obs:
                    self.tracks.pop(tid, None)


def new_frame_id() -> int:
    return next(_frame_id_counter)
