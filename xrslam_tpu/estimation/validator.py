"""Jacobian validator: finite-difference / autodiff checking of factor
Jacobians.

Replaces the reference's CostFunctionValidator (reference:
xrslam/src/xrslam/estimation/ceres/cost_function_validator.h:9-377 —
finite-difference checks with `Options{fd_epsilon,max_jacobian_error}`
under the quaternion ⊞) with `jax.jacfwd` through the retraction: the
same on-manifold derivative, exact instead of finite-differenced. The
test pyramid uses this to validate every hand-vectorized factor
Jacobian in factors.py (SURVEY.md §4).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from .window import ES_SIZE, WindowData, WindowState, retract


@dataclass
class Options:
    """reference CostFunctionValidator::Options."""
    max_jacobian_error: float = 2e-6
    fd_epsilon: float = 1e-7  # used only by the finite-difference mode


def autodiff_frame_jacobian(residual_fn, state: WindowState,
                            data: WindowData) -> jnp.ndarray:
    """d residual / d frame-error-states via jacfwd through retract:
    residual_fn(state, data) -> (R,) flat residual vector. Returns
    (R, K*15)."""
    K = state.q.shape[0]

    def at(dx_flat):
        dx = dx_flat.reshape(K, ES_SIZE)
        dd = jnp.zeros_like(state.inv_depth)
        return residual_fn(retract(state, dx, dd), data)

    return jax.jacfwd(at)(jnp.zeros((K * ES_SIZE,), dtype=state.p.dtype))


def autodiff_landmark_jacobian(residual_fn, state: WindowState,
                               data: WindowData) -> jnp.ndarray:
    """d residual / d inverse-depths, (R, L)."""
    K = state.q.shape[0]

    def at(dd):
        dx = jnp.zeros((K, ES_SIZE), dtype=state.p.dtype)
        return residual_fn(retract(state, dx, dd), data)

    return jax.jacfwd(at)(jnp.zeros_like(state.inv_depth))


def fd_frame_jacobian(residual_fn, state: WindowState, data: WindowData,
                      eps: float = 1e-7) -> np.ndarray:
    """Central finite differences through the retraction — the literal
    mechanism of the reference validator, kept as an independent oracle
    for the autodiff path itself."""
    K = state.q.shape[0]
    n = K * ES_SIZE
    r0 = np.asarray(residual_fn(state, data))
    J = np.zeros((r0.size, n))
    for i in range(n):
        dx = np.zeros((n,))
        dx[i] = eps
        dxp = jnp.asarray(dx.reshape(K, ES_SIZE))
        dd = jnp.zeros_like(state.inv_depth)
        rp = np.asarray(residual_fn(retract(state, dxp, dd), data))
        rm = np.asarray(residual_fn(retract(state, -dxp, dd), data))
        J[:, i] = (rp - rm).reshape(-1) / (2 * eps)
    return J


def validate(residual_fn, analytic_J, state: WindowState, data: WindowData,
             options: Options = Options()) -> float:
    """Max abs deviation between `analytic_J` (R, K*15) and the autodiff
    Jacobian; raises if it exceeds options.max_jacobian_error (the
    reference's Validate() contract)."""
    J_ref = np.asarray(autodiff_frame_jacobian(residual_fn, state, data))
    err = float(np.abs(np.asarray(analytic_J) - J_ref).max())
    if err > options.max_jacobian_error:
        raise AssertionError(
            f"Jacobian error {err:.3e} > {options.max_jacobian_error:.3e}")
    return err
