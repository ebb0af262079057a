"""Distributed-Schur BA on the virtual 8-device CPU mesh: the sharded
solve must match the single-device solve to numerical precision (same
math, different placement), for both the single-window and the
batched (data × model) deployments."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from xrslam_tpu.estimation.solver import SolveOptions, solve_window
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import circle_scene, euler_consistent, window_problem
from xrslam_tpu.parallel import sharded
from xrslam_tpu.parallel.mesh import make_mesh


def _problem(K=6, L=64, dtype=jnp.float64):
    scene = euler_consistent(
        circle_scene(n_frames=K * 2 + 1, n_landmarks=L - 8, dtype=dtype))
    q_bc = lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0], dtype=dtype))
    p_bc = jnp.array([0.02, -0.01, 0.03], dtype=dtype)
    return window_problem(scene, list(range(0, K * 2, 2)), L=L,
                          q_bc=q_bc, p_bc=p_bc, dtype=dtype)


@pytest.fixture(scope="module")
def problem():
    return _problem()


def _perturb(state, key):
    from tests.helpers import perturb_state

    return perturb_state(state, key)


def test_sharded_matches_single(problem):
    state, data = problem
    state = _perturb(state, jax.random.PRNGKey(0))
    opts = SolveOptions(iterations=5)

    ref, info_ref = solve_window(state, data, opts)

    mesh = make_mesh(8, shape=(2, 4))  # model axis = 4 shards of L=64
    s_sh, d_sh = sharded.shard_window(mesh, state, data)
    out, info = sharded.solve_window_sharded(mesh, s_sh, d_sh, opts)

    np.testing.assert_allclose(np.asarray(info["cost"]),
                               np.asarray(info_ref["cost"]),
                               rtol=1e-9, atol=1e-12)
    for name in ("q", "p", "v", "inv_depth"):
        np.testing.assert_allclose(np.asarray(getattr(out, name)),
                                   np.asarray(getattr(ref, name)),
                                   rtol=1e-7, atol=1e-9,
                                   err_msg=name)


def test_batch_sharded_matches_vmap(problem):
    state, data = problem
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(1), B)
    states = jax.vmap(lambda k: _perturb(state, k))(keys)
    datas = jax.tree.map(lambda x: jnp.broadcast_to(x, (B,) + x.shape), data)
    opts = SolveOptions(iterations=3)

    ref, info_ref = jax.vmap(lambda s, d: solve_window(s, d, opts))(
        states, datas)

    mesh = make_mesh(8, shape=(4, 2))  # 4-way data, 2-way model
    out, info = sharded.solve_batch_sharded(mesh, states, datas, opts)

    np.testing.assert_allclose(np.asarray(info["cost"]),
                               np.asarray(info_ref["cost"]),
                               rtol=1e-9, atol=1e-12)
    np.testing.assert_allclose(np.asarray(out.p), np.asarray(ref.p),
                               rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.asarray(out.inv_depth),
                               np.asarray(ref.inv_depth),
                               rtol=1e-7, atol=1e-9)


def test_cost_decreases_under_sharding(problem):
    state, data = problem
    state = _perturb(state, jax.random.PRNGKey(2))
    mesh = make_mesh(8, shape=(1, 8))
    s_sh, d_sh = sharded.shard_window(mesh, state, data)
    out, info = sharded.solve_window_sharded(
        mesh, s_sh, d_sh, SolveOptions(iterations=6))
    assert float(info["cost"]) < float(info["cost0"])
    assert np.isfinite(np.asarray(info["cost_history"])).all()
