"""IMU buffer capacity: fixed-shape buffers must never silently drop
samples (the reference keeps unbounded std::vectors,
preintegrator.h:44-48). Round 3 shipped a silent overflow on the
rotation-merge path (3 frames' IMU concatenated into one interval
exceeded a hard cap of 128); these tests pin the bucketing fix."""

import numpy as np
import pytest

from xrslam_tpu.config import Config
from xrslam_tpu.core.map import FrameRec, PipelineMap
from xrslam_tpu.core.window_builder import (
    IMU_CAP_BUCKETS, bucket_imu_cap, extract_window, interval_samples,
    needed_imu_cap,
)
from xrslam_tpu.imu import preintegration as pre

IMU_NOISE = pre.ImuNoise.isotropic(1e-4, 1e-2, 1e-8, 1e-6)


def _frame(fid, t, n_imu, t0):
    ts = t0 + np.linspace(0.0, t - t0, n_imu, endpoint=False)
    return FrameRec(
        id=fid, t=t,
        q=np.array([1.0, 0, 0, 0]), p=np.zeros(3), v=np.zeros(3),
        bg=np.zeros(3), ba=np.zeros(3),
        q_bc=np.array([1.0, 0, 0, 0]), p_bc=np.zeros(3),
        q_bi=np.array([1.0, 0, 0, 0]), p_bi=np.zeros(3),
        K=np.eye(3), sqrt_inv_cov2=np.eye(2),
        bearings=np.zeros((4, 3)) + np.array([0, 0, 1.0]),
        track_ids=np.full((4,), -1, dtype=np.int64),
        imu_t=ts, imu_w=np.zeros((n_imu, 3)),
        imu_a=np.tile(np.array([0.0, 0.0, 9.81]), (n_imu, 1)),
    )


def test_bucket_ladder():
    assert bucket_imu_cap(1) == IMU_CAP_BUCKETS[0]
    assert bucket_imu_cap(128) == 128
    assert bucket_imu_cap(129) == 192
    assert bucket_imu_cap(130) == 192  # the round-3 overflow case
    with pytest.raises(RuntimeError):
        bucket_imu_cap(IMU_CAP_BUCKETS[-1] + 1)


def test_interval_samples_overflow_raises():
    f = _frame(0, 0.05, 130, 0.0)
    with pytest.raises(RuntimeError, match="overflow"):
        interval_samples([f], 128)
    # at the bucketed cap every sample survives
    t_buf, w_buf, a_buf, n, t0 = interval_samples([f], bucket_imu_cap(130))
    assert n == 130


def test_extract_window_buckets_merged_intervals():
    """A merged (rotation 3->1) interval holding more samples than the
    floor cap must be integrated in full, not truncated."""
    pmap = PipelineMap()
    dt = 0.05
    n_merged = 150  # a 3->1 merged subframe carries 3 frames' IMU
    frames = []
    for j in range(4):
        n = n_merged if j == 2 else 10
        f = _frame(j, (j + 1) * dt, n, j * dt)
        frames.append(f)
        pmap.attach_frame(f)
    state, data, meta = extract_window(
        pmap, frames, 6, 8, IMU_NOISE, imu_cap=128,
    )
    # no exception, and the merged interval integrated all 150 samples
    counts = np.asarray(meta.imu_dev[4])
    assert int(counts[2]) == n_merged
    # buffer capacity was bucketed above the 128 floor
    assert meta.imu_dev[0].shape[-1] >= n_merged
    # dt of the merged delta spans the whole interval
    assert float(np.asarray(data.preint.t)[2]) == pytest.approx(
        frames[2].t - float(frames[2].imu_t[0]), abs=1e-6)


def test_needed_cap_respects_floor():
    f = _frame(0, 0.05, 10, 0.0)
    assert needed_imu_cap([[f]], floor=96) == 96
    assert needed_imu_cap([[f] * 20], floor=96) == 256
