"""IMU preintegration vs closed forms, autodiff bias Jacobians, and
covariance/sqrt-information consistency (replaces the reference's
CostFunctionValidator role for the integrator; SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np

from xrslam_tpu.geometry import lie
from xrslam_tpu.imu import preintegration as pre


NOISE = pre.ImuNoise.isotropic(1e-4, 1e-2, 1e-6, 1e-4)


def _buffers(n=40, hz=200.0, w=None, a=None, key=None):
    ts = jnp.arange(n, dtype=jnp.float64) / hz
    if key is not None:
        kw, ka = jax.random.split(key)
        ws = 0.5 * jax.random.normal(kw, (n, 3), dtype=jnp.float64)
        accs = jnp.array([0.0, 0.0, 9.81]) + jax.random.normal(ka, (n, 3), dtype=jnp.float64)
    else:
        ws = jnp.broadcast_to(jnp.asarray(w, dtype=jnp.float64), (n, 3))
        accs = jnp.broadcast_to(jnp.asarray(a, dtype=jnp.float64), (n, 3))
    t_end = ts[-1] + 1.0 / hz
    return ts, ws, accs, t_end


def test_constant_accel_closed_form():
    a = jnp.array([0.3, -0.2, 9.81])
    ts, ws, accs, t_end = _buffers(w=[0.0, 0.0, 0.0], a=a)
    zero = jnp.zeros(3, dtype=jnp.float64)
    d = pre.integrate(ts, ws, accs, t_end, zero, zero, NOISE, compute_sqrt_inv=False)
    T = float(t_end)
    np.testing.assert_allclose(d.t, T, atol=1e-12)
    np.testing.assert_allclose(d.q, jnp.array([1.0, 0, 0, 0]), atol=1e-12)
    np.testing.assert_allclose(d.v, a * T, atol=1e-10)
    # Euler integration of p: sum dt*v_i + 0.5 dt^2 a == 0.5 a T^2 exactly
    # for constant a (v_i = a*t_i).
    np.testing.assert_allclose(d.p, 0.5 * a * T * T, atol=1e-10)


def test_constant_gyro_closed_form():
    w = jnp.array([0.1, -0.2, 0.3])
    ts, ws, accs, t_end = _buffers(w=w, a=[0.0, 0.0, 0.0])
    zero = jnp.zeros(3, dtype=jnp.float64)
    d = pre.integrate(ts, ws, accs, t_end, zero, zero, NOISE, compute_sqrt_inv=False)
    q_expect = lie.expmap(w * t_end)
    dot = jnp.abs(jnp.sum(d.q * q_expect))
    np.testing.assert_allclose(dot, 1.0, atol=1e-12)


def test_bias_subtraction():
    """Integrating (w, a) with bias b equals integrating (w-b, a) with 0."""
    key = jax.random.PRNGKey(0)
    ts, ws, accs, t_end = _buffers(key=key)
    bg = jnp.array([0.01, -0.02, 0.005])
    ba = jnp.array([0.1, 0.05, -0.08])
    zero = jnp.zeros(3, dtype=jnp.float64)
    d1 = pre.integrate(ts, ws, accs, t_end, bg, ba, NOISE, compute_sqrt_inv=False)
    d2 = pre.integrate(ts, ws - bg, accs - ba, t_end, zero, zero, NOISE, compute_sqrt_inv=False)
    np.testing.assert_allclose(d1.p, d2.p, atol=1e-12)
    np.testing.assert_allclose(d1.v, d2.v, atol=1e-12)
    np.testing.assert_allclose(jnp.abs(jnp.sum(d1.q * d2.q)), 1.0, atol=1e-14)


def test_bias_jacobians_vs_autodiff():
    """First-order bias correction Jacobians match autodiff of the full
    integration (the reference validates these only implicitly through
    the factor's finite-difference checks; autodiff is our oracle)."""
    key = jax.random.PRNGKey(1)
    ts, ws, accs, t_end = _buffers(n=30, key=key)
    bg0 = jnp.array([0.02, -0.01, 0.03])
    ba0 = jnp.array([0.05, 0.1, -0.02])
    d0 = pre.integrate(ts, ws, accs, t_end, bg0, ba0, NOISE, compute_sqrt_inv=False)

    def deltas(bg, ba):
        d = pre.integrate(ts, ws, accs, t_end, bg, ba, NOISE, compute_sqrt_inv=False)
        # rotation error in the tangent at d0.q, matching the factor's
        # convention  Δq(b) ≈ Δq(b0) ⊗ exp(dq_dbg (bg-bg0))
        dq = lie.logmap(lie.quat_mul(lie.quat_conj(d0.q), d.q))
        return dq, d.p, d.v

    Jbg = jax.jacrev(lambda b: deltas(b, ba0))(bg0)
    Jba = jax.jacrev(lambda b: deltas(bg0, b))(ba0)
    np.testing.assert_allclose(Jbg[0], d0.dq_dbg, atol=1e-6)
    np.testing.assert_allclose(Jbg[1], d0.dp_dbg, atol=1e-6)
    np.testing.assert_allclose(Jbg[2], d0.dv_dbg, atol=1e-6)
    np.testing.assert_allclose(Jba[1], d0.dp_dba, atol=1e-9)
    np.testing.assert_allclose(Jba[2], d0.dv_dba, atol=1e-9)
    # dq/dba is exactly zero
    np.testing.assert_allclose(Jba[0], jnp.zeros((3, 3)), atol=1e-12)


def test_covariance_psd_and_sqrt_inv():
    key = jax.random.PRNGKey(2)
    ts, ws, accs, t_end = _buffers(n=50, key=key)
    zero = jnp.zeros(3, dtype=jnp.float64)
    d = pre.integrate(ts, ws, accs, t_end, zero, zero, NOISE)
    evals = np.linalg.eigvalsh(np.asarray(d.cov))
    assert np.all(evals > 0), evals
    UtU = np.asarray(d.sqrt_inv_cov).T @ np.asarray(d.sqrt_inv_cov)
    np.testing.assert_allclose(UtU @ np.asarray(d.cov), np.eye(15), atol=1e-6)
    # upper triangular
    np.testing.assert_allclose(np.tril(np.asarray(d.sqrt_inv_cov), -1), 0.0, atol=1e-12)


def test_masked_buffer_equals_trimmed():
    key = jax.random.PRNGKey(3)
    ts, ws, accs, t_end = _buffers(n=40, key=key)
    zero = jnp.zeros(3, dtype=jnp.float64)
    count = 25
    t_mid = ts[count - 1] + 0.004
    d_masked = pre.integrate(ts, ws, accs, t_mid, zero, zero, NOISE, count=count)
    d_trim = pre.integrate(ts[:count], ws[:count], accs[:count], t_mid, zero, zero, NOISE)
    for a, b in zip(d_masked, d_trim):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-12)


def test_predict_stationary():
    """A body at rest measuring a = +g in body frame stays at rest under
    gravity-forward prediction (reference preintegrator.cpp:102-112)."""
    ts, ws, accs, t_end = _buffers(w=[0.0, 0.0, 0.0], a=[0.0, 0.0, pre.GRAVITY_NOMINAL])
    zero = jnp.zeros(3, dtype=jnp.float64)
    d = pre.integrate(ts, ws, accs, t_end, zero, zero, NOISE, compute_sqrt_inv=False)
    q0 = lie.quat_identity()
    p0 = jnp.array([1.0, 2.0, 3.0])
    v0 = jnp.zeros(3, dtype=jnp.float64)
    q1, p1, v1, _, _ = pre.predict(q0, p0, v0, zero, zero, d)
    np.testing.assert_allclose(p1, p0, atol=1e-9)
    np.testing.assert_allclose(v1, v0, atol=1e-9)
    np.testing.assert_allclose(jnp.abs(jnp.sum(q1 * q0)), 1.0, atol=1e-12)


def test_integrate_jit_and_vmap():
    key = jax.random.PRNGKey(4)
    ts, ws, accs, t_end = _buffers(n=20, key=key)
    zero = jnp.zeros(3, dtype=jnp.float64)
    f = jax.jit(lambda b: pre.integrate(ts, ws, accs, t_end, b, zero, NOISE))
    d = f(zero)
    assert np.isfinite(np.asarray(d.cov)).all()
    # vmap over a batch of bias hypotheses (as used by IMU-PARSAC seeding)
    bgs = 0.01 * jax.random.normal(key, (8, 3), dtype=jnp.float64)
    dv = jax.vmap(lambda b: pre.integrate(ts, ws, accs, t_end, b, zero, NOISE, compute_sqrt_inv=False).v)(bgs)
    assert dv.shape == (8, 3)
