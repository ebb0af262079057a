"""Shared test fixtures: build solver window problems from synthetic
scenes (thin wrappers over xrslam_tpu.io.synthetic)."""

import jax
import jax.numpy as jnp
import numpy as np

from xrslam_tpu.geometry import lie
from xrslam_tpu.imu import preintegration as pre
from xrslam_tpu.io.synthetic import (  # noqa: F401  (re-exported for tests)
    Scene, bearings_of, circle_scene, euler_consistent, window_problem,
)
from xrslam_tpu.estimation.window import WindowState

IMU_NOISE = pre.ImuNoise.isotropic(1e-4, 1e-2, 1e-8, 1e-6)

build_window = window_problem


def perturb_state(state: WindowState, key, pose_scale=0.02, rot_scale=0.01,
                  vel_scale=0.02, bias_scale=0.002, invd_scale=0.02, skip_frames=(0,)):
    """Random perturbation of a window state (skipping listed frames)."""
    K = state.q.shape[0]
    keys = jax.random.split(key, 6)
    m = np.ones(K)
    for s in skip_frames:
        m[s] = 0.0
    m = jnp.asarray(m)[:, None]
    dq = rot_scale * jax.random.normal(keys[0], (K, 3), dtype=state.p.dtype) * m
    dp = pose_scale * jax.random.normal(keys[1], (K, 3), dtype=state.p.dtype) * m
    dv = vel_scale * jax.random.normal(keys[2], (K, 3), dtype=state.p.dtype) * m
    dbg = bias_scale * jax.random.normal(keys[3], (K, 3), dtype=state.p.dtype) * m
    dba = bias_scale * jax.random.normal(keys[4], (K, 3), dtype=state.p.dtype) * m
    dd = invd_scale * jax.random.normal(keys[5], state.inv_depth.shape, dtype=state.p.dtype)
    return WindowState(
        q=lie.quat_normalize(lie.quat_mul(state.q, lie.expmap(dq))),
        p=state.p + dp, v=state.v + dv, bg=state.bg + dbg, ba=state.ba + dba,
        inv_depth=state.inv_depth * (1.0 + dd),
    )


def state_errors(a: WindowState, b: WindowState):
    """(rotation angle, position, velocity) error norms between states."""
    dth = lie.logmap(lie.quat_mul(lie.quat_conj(a.q), b.q))
    return (
        float(jnp.max(jnp.linalg.norm(dth, axis=-1))),
        float(jnp.max(jnp.linalg.norm(a.p - b.p, axis=-1))),
        float(jnp.max(jnp.linalg.norm(a.v - b.v, axis=-1))),
    )
