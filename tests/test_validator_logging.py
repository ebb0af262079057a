"""Jacobian-validator (reference CostFunctionValidator replacement) and
logging subsystem tests."""

import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.estimation import factors
from xrslam_tpu.estimation.validator import (
    Options, autodiff_frame_jacobian, fd_frame_jacobian, validate,
)
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import circle_scene, euler_consistent, window_problem
from xrslam_tpu.utils.logging import Logger, log_info, runtime_assert, set_level


@pytest.fixture(scope="module")
def problem():
    scene = euler_consistent(circle_scene(n_frames=9, n_landmarks=24))
    q_bc = lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0], dtype=jnp.float64))
    return window_problem(scene, [0, 2, 4, 6], L=32, q_bc=q_bc,
                          p_bc=jnp.array([0.02, -0.01, 0.03]), dtype=jnp.float64)


def _preint_residual(state, data):
    r, _, _, _ = factors.preint_residual_jac(state, data)
    return r.reshape(-1)


def test_autodiff_matches_fd(problem):
    from tests.helpers import perturb_state
    import jax

    state, data = problem
    state = perturb_state(state, jax.random.PRNGKey(0))
    J_ad = np.asarray(autodiff_frame_jacobian(_preint_residual, state, data))
    J_fd = fd_frame_jacobian(_preint_residual, state, data, eps=1e-6)
    assert np.abs(J_ad - J_fd).max() < 1e-5


def test_validate_passes_analytic_preint(problem):
    """The hand-vectorized preintegration Jacobians must agree with the
    autodiff oracle — the reference's test_se3_cost_function contract
    (max_jacobian_error 2e-6)."""
    from tests.helpers import perturb_state
    import jax

    state, data = problem
    state = perturb_state(state, jax.random.PRNGKey(1))
    r, Ji, Jj, m = factors.preint_residual_jac(state, data)
    K = state.q.shape[0]
    R = r.size

    # scatter the per-pair Jacobians into the full (R, K*15) layout
    J = np.zeros((R, K * 15))
    rJi, rJj = np.asarray(Ji), np.asarray(Jj)
    for j in range(1, K):
        rows = slice(j * 15, (j + 1) * 15)
        J[rows, (j - 1) * 15: j * 15] = rJi[j]
        J[rows, j * 15: (j + 1) * 15] = rJj[j]
    err = validate(_preint_residual, J, state, data,
                   Options(max_jacobian_error=2e-6))
    assert err < 2e-6


def test_validate_rejects_wrong_jacobian(problem):
    state, data = problem
    K = state.q.shape[0]
    bad = np.ones((K * 15, K * 15))
    with pytest.raises(AssertionError):
        validate(_preint_residual, bad, state, data)


def test_logging_and_queue():
    import io
    import logging as pylogging

    set_level("info")
    buf = io.StringIO()
    h = pylogging.StreamHandler(buf)
    h.setFormatter(pylogging.Formatter("[XRSLAM][%(levelname)s] %(message)s"))
    logger = pylogging.getLogger("XRSLAM")
    logger.addHandler(h)
    try:
        log_info("hello %d", 42)
    finally:
        logger.removeHandler(h)
    assert "[XRSLAM][INFO] hello 42" in buf.getvalue()

    q = Logger.instance()
    q.push_message("a")
    q.push_message("b")
    assert q.get_all_messages() == ["a", "b"]
    assert q.get_all_messages() == []

    with pytest.raises(AssertionError):
        runtime_assert(False, "boom")
