"""Math-substrate unit tests: quaternion/SO(3) ops vs closed forms and
scipy, Taylor-guard behavior near singularities, autodiff safety."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from xrslam_tpu.geometry import lie


def rand_w(key, n, scale=2.0):
    return scale * jax.random.normal(key, (n, 3), dtype=jnp.float64)


def test_hat():
    w = jnp.array([1.0, 2.0, 3.0])
    h = lie.hat(w)
    v = jnp.array([0.5, -1.0, 2.0])
    np.testing.assert_allclose(h @ v, jnp.cross(w, v), atol=1e-15)
    np.testing.assert_allclose(h, -h.T, atol=1e-15)


def test_expmap_vs_scipy():
    key = jax.random.PRNGKey(0)
    w = rand_w(key, 64)
    q = lie.expmap(w)  # [w,x,y,z]
    q_scipy = R.from_rotvec(np.array(w)).as_quat()  # [x,y,z,w]
    q_ref = np.concatenate([q_scipy[:, 3:4], q_scipy[:, :3]], axis=1)
    sign = np.sign(np.sum(np.asarray(q) * q_ref, axis=1, keepdims=True))
    np.testing.assert_allclose(np.asarray(q), sign * q_ref, atol=1e-12)


def test_log_exp_roundtrip():
    key = jax.random.PRNGKey(1)
    w = rand_w(key, 64, scale=1.0)
    # logmap returns the principal rotation vector; keep |w| < pi
    w = w / jnp.maximum(1.0, jnp.linalg.norm(w, axis=-1, keepdims=True) / 3.1)
    np.testing.assert_allclose(lie.logmap(lie.expmap(w)), w, atol=1e-10)
    # tiny angles
    w_small = rand_w(key, 16, scale=1e-9)
    np.testing.assert_allclose(lie.logmap(lie.expmap(w_small)), w_small, atol=1e-18)
    # zero
    np.testing.assert_allclose(lie.logmap(lie.expmap(jnp.zeros(3))), jnp.zeros(3), atol=0)


def test_quat_mul_rotate_matrix_consistency():
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    qa, qb = lie.expmap(rand_w(k1, 32)), lie.expmap(rand_w(k2, 32))
    v = jax.random.normal(k3, (32, 3), dtype=jnp.float64)
    # rotate == matrix action
    np.testing.assert_allclose(
        lie.quat_rotate(qa, v), jnp.einsum("nij,nj->ni", lie.quat_to_matrix(qa), v), atol=1e-12
    )
    # composition
    np.testing.assert_allclose(
        lie.quat_rotate(lie.quat_mul(qa, qb), v),
        lie.quat_rotate(qa, lie.quat_rotate(qb, v)),
        atol=1e-12,
    )
    # inverse
    np.testing.assert_allclose(lie.quat_rotate_inv(qa, lie.quat_rotate(qa, v)), v, atol=1e-12)


def test_matrix_to_quat_roundtrip():
    key = jax.random.PRNGKey(3)
    q = lie.expmap(rand_w(key, 128, scale=3.0))
    m = lie.quat_to_matrix(q)
    q2 = lie.matrix_to_quat(m)
    # same rotation up to sign
    dot = jnp.abs(jnp.sum(q * q2, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)
    # edge cases: identity and 180-degree rotations about each axis
    for rv in [np.zeros(3), [np.pi, 0, 0], [0, np.pi, 0], [0, 0, np.pi]]:
        q = lie.expmap(jnp.asarray(rv, dtype=jnp.float64))
        q2 = lie.matrix_to_quat(lie.quat_to_matrix(q))
        assert abs(float(jnp.abs(jnp.sum(q * q2)))) == pytest.approx(1.0, abs=1e-12)


def test_right_jacobian_definition():
    """Jr satisfies: exp(w + dw) ≈ exp(w) * exp(Jr(w) dw)."""
    key = jax.random.PRNGKey(4)
    w = rand_w(key, 16, scale=1.5)
    dw = 1e-6 * jax.random.normal(jax.random.PRNGKey(5), (16, 3), dtype=jnp.float64)
    lhs = lie.expmap(w + dw)
    rhs = lie.quat_mul(lie.expmap(w), lie.expmap(jnp.einsum("nij,nj->ni", lie.right_jacobian(w), dw)))
    dot = jnp.abs(jnp.sum(lhs * rhs, axis=-1))
    np.testing.assert_allclose(dot, 1.0, atol=1e-14)


def test_right_jacobian_small_angle_continuity():
    w = jnp.array([[1e-12, 0, 0], [0.0, 0, 0], [9.9999999e-4, 0, 0], [1.0000001e-3, 0, 0]], dtype=jnp.float64)
    J = lie.right_jacobian(w)
    # near-identity at 0
    np.testing.assert_allclose(J[1], jnp.eye(3), atol=1e-12)
    # continuity across the Taylor switch (straddling points differ by 2e-10)
    np.testing.assert_allclose(J[2], J[3], atol=1e-9)


def test_right_jacobian_inv():
    key = jax.random.PRNGKey(6)
    w = rand_w(key, 32, scale=1.5)
    J = lie.right_jacobian(w)
    Jinv = lie.right_jacobian_inv(w)
    np.testing.assert_allclose(J @ Jinv, jnp.broadcast_to(jnp.eye(3), (32, 3, 3)), atol=1e-10)
    # small angle
    w0 = jnp.zeros((1, 3), dtype=jnp.float64)
    np.testing.assert_allclose(lie.right_jacobian_inv(w0)[0], jnp.eye(3), atol=1e-12)


def test_s2_tangential_basis():
    key = jax.random.PRNGKey(7)
    x = jax.random.normal(key, (64, 3), dtype=jnp.float64)
    B = lie.s2_tangential_basis(x)
    # columns orthonormal and orthogonal to x
    np.testing.assert_allclose(
        jnp.einsum("nid,nie->nde", B, B), jnp.broadcast_to(jnp.eye(2), (64, 2, 2)), atol=1e-12
    )
    np.testing.assert_allclose(jnp.einsum("nid,ni->nd", B, x), 0.0, atol=1e-10)


def test_grad_safety():
    """Gradients must not be NaN at/near singular points (the where-trick
    guards)."""

    def f(w):
        return jnp.sum(lie.expmap(w) ** 2) + jnp.sum(lie.right_jacobian(w))

    g = jax.grad(f)(jnp.zeros(3, dtype=jnp.float64))
    assert np.all(np.isfinite(np.asarray(g)))
    g = jax.grad(f)(jnp.full(3, 1e-8, dtype=jnp.float64))
    assert np.all(np.isfinite(np.asarray(g)))

    def h(q):
        return jnp.sum(lie.logmap(lie.quat_normalize(q)))

    g = jax.grad(h)(jnp.array([1.0, 1e-9, 0, 0], dtype=jnp.float64))
    assert np.all(np.isfinite(np.asarray(g)))


def test_slerp():
    q0 = lie.expmap(jnp.zeros(3, dtype=jnp.float64))
    q1 = lie.expmap(jnp.array([0.0, 0.0, 1.0], dtype=jnp.float64))
    qm = lie.slerp(q0, q1, 0.5)
    np.testing.assert_allclose(
        lie.logmap(qm), jnp.array([0.0, 0.0, 0.5]), atol=1e-12
    )
