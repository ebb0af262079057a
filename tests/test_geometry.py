"""Camera model + triangulation tests vs synthetic ground truth."""

import jax
import jax.numpy as jnp
import numpy as np

from xrslam_tpu.geometry import camera, lie, triangulate


K = jnp.array([[458.0, 0.0, 367.0], [0.0, 457.0, 248.0], [0.0, 0.0, 1.0]], dtype=jnp.float64)


def test_apply_remove_k_roundtrip():
    key = jax.random.PRNGKey(0)
    uv = jax.random.uniform(key, (128, 2), minval=50.0, maxval=400.0, dtype=jnp.float64)
    bearing = camera.remove_k(uv, K)
    np.testing.assert_allclose(jnp.linalg.norm(bearing, axis=-1), 1.0, atol=1e-12)
    uv2 = camera.apply_k(bearing, K)
    np.testing.assert_allclose(uv2, uv, atol=1e-9)


def test_dproj_dp_vs_autodiff():
    p = jnp.array([0.3, -0.2, 2.0], dtype=jnp.float64)
    J = camera.dproj_dp(p)
    J_ad = jax.jacfwd(lambda q: q[:2] / q[2])(p)
    np.testing.assert_allclose(J, J_ad, atol=1e-14)


def test_undistort_roundtrip():
    dist = jnp.array([-0.28, 0.07, 1.8e-4, 8.0e-5], dtype=jnp.float64)  # EuRoC-like
    key = jax.random.PRNGKey(1)
    xn = jax.random.uniform(key, (256, 2), minval=-0.55, maxval=0.55, dtype=jnp.float64)
    xd = camera.distort_radtan(xn, dist)
    xu = camera.undistort_radtan(xd, dist, iters=20)
    np.testing.assert_allclose(xu, xn, atol=1e-6)


def _make_views(key, n_views=4):
    """Random camera ring looking at the origin; returns Ps, centers."""
    angles = jnp.linspace(0, 1.0, n_views)
    Ps, centers, qs = [], [], []
    for a in angles:
        c = jnp.array([jnp.cos(a), jnp.sin(a), -4.0 + 0.2 * a])
        q = lie.expmap(0.05 * jnp.array([a, -a, a]))
        Rm = lie.quat_to_matrix(q)  # cam-to-world
        # world-to-camera projection P = [R^T, -R^T c]
        P = jnp.concatenate([Rm.T, (-Rm.T @ c)[:, None]], axis=1)
        Ps.append(P)
        centers.append(c)
    return jnp.stack(Ps), jnp.stack(centers)


def test_triangulate_exact():
    Ps, centers = _make_views(None)
    x_gt = jnp.array([0.3, -0.1, 0.5], dtype=jnp.float64)
    xh = jnp.concatenate([x_gt, jnp.ones(1)])
    pts = jnp.einsum("nij,j->ni", Ps, xh)
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)  # bearings
    x_est = triangulate.triangulate_point(Ps, pts)
    x_est = x_est[:3] / x_est[3]
    np.testing.assert_allclose(x_est, x_gt, atol=1e-9)
    # cheirality: all depths positive
    depths = triangulate.cheirality_depths(Ps, triangulate.triangulate_point(Ps, pts))
    assert np.all(np.asarray(depths) > 0)


def test_triangulate_masked_matches_subset():
    Ps, _ = _make_views(None, n_views=6)
    x_gt = jnp.array([0.2, 0.4, 1.0, 1.0], dtype=jnp.float64)
    pts = jnp.einsum("nij,j->ni", Ps, x_gt)
    noise = 1e-5 * jax.random.normal(jax.random.PRNGKey(3), pts.shape, dtype=jnp.float64)
    pts = pts + noise
    mask = jnp.array([1, 1, 1, 1, 0, 0], dtype=bool)
    x_masked = triangulate.triangulate_point(Ps, pts, mask)
    x_subset = triangulate.triangulate_point(Ps[:4], pts[:4])
    a = np.asarray(x_masked[:3] / x_masked[3])
    b = np.asarray(x_subset[:3] / x_subset[3])
    np.testing.assert_allclose(a, b, atol=1e-8)


def test_triangulate_batched():
    Ps, centers = _make_views(None)
    key = jax.random.PRNGKey(4)
    x_gt = jnp.array([0.0, 0.0, 0.0]) + 0.5 * jax.random.normal(key, (32, 3), dtype=jnp.float64)
    xh = jnp.concatenate([x_gt, jnp.ones((32, 1))], axis=-1)
    pts = jnp.einsum("nij,bj->bni", Ps, xh)
    x_est = jax.vmap(lambda p: triangulate.triangulate_point(Ps, p))(pts)
    x_est = x_est[:, :3] / x_est[:, 3:4]
    np.testing.assert_allclose(x_est, x_gt, atol=1e-8)
    ang = triangulate.triangulation_angle(x_gt, centers[0], centers[-1])
    assert np.all(np.asarray(ang) > 0)
