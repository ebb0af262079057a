"""wave_scene consistency: autodiff IMU must dead-reckon back to the
analytic trajectory, and the excitation must be non-degenerate (time-
varying body-frame specific force — the observability requirement for
monocular VI initialization)."""

import jax.numpy as jnp
import numpy as np

from xrslam_tpu.io.synthetic import euler_consistent, wave_scene


def test_wave_scene_imu_consistency():
    scene = euler_consistent(wave_scene(n_frames=40, n_landmarks=8))
    raw = wave_scene(n_frames=40, n_landmarks=8)
    # dead-reckoned states stay close to the analytic ones (Euler @200Hz)
    dp = np.linalg.norm(np.asarray(scene.p) - np.asarray(raw.p), axis=1)
    path = np.sum(np.linalg.norm(np.diff(np.asarray(raw.p), axis=0), axis=1))
    assert dp.max() < 0.01 * path, (dp.max(), path)
    dv = np.linalg.norm(np.asarray(scene.v) - np.asarray(raw.v), axis=1)
    assert dv.max() < 0.05


def test_wave_scene_excitation_nondegenerate():
    scene = wave_scene(n_frames=40, n_landmarks=8)
    a = np.asarray(scene.imu_a).reshape(-1, 3)
    w = np.asarray(scene.imu_w).reshape(-1, 3)
    # body-frame specific force and angular rate must vary over time
    # (constant values = the degenerate constant-twist case)
    assert a.std(axis=0).max() > 0.1
    assert w.std(axis=0).max() > 0.05
    # magnitude sane: dominated by gravity
    assert abs(np.linalg.norm(a, axis=1).mean() - 9.8) < 1.5
