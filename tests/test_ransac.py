"""Robust-estimation tests: synthetic ground truth + planted outliers
(SURVEY.md §4 item 1: solver-level checks vs synthetic GT)."""

import jax
import jax.numpy as jnp
import numpy as np

from xrslam_tpu.geometry import lie
from xrslam_tpu.ransac import parsac as parsac_mod
from xrslam_tpu.ransac import pnp as pnp_mod
from xrslam_tpu.ransac import stereo as stereo_mod


def _two_view(key, N=80, n_out=16, rot=(0.1, -0.05, 0.02), t=(0.4, 0.1, -0.2)):
    """Synthetic two-view geometry: returns normalized points and GT."""
    k1, k2, k3 = jax.random.split(key, 3)
    X = jax.random.uniform(k1, (N, 3), minval=-2.0, maxval=2.0).at[:, 2].add(6.0)
    R = lie.quat_to_matrix(lie.expmap(jnp.asarray(rot, dtype=jnp.float64)))
    t = jnp.asarray(t, dtype=jnp.float64)
    X2 = X @ R.T + t
    p1 = X[:, :2] / X[:, 2:3]
    p2 = X2[:, :2] / X2[:, 2:3]
    # plant outliers in view 2 (noise bounded away from 0 so a planted
    # outlier can never be an accidental inlier)
    noise = jax.random.uniform(k2, (N, 2), minval=-0.4, maxval=0.4)
    noise = jnp.sign(noise) * (0.05 + jnp.abs(noise))
    is_out = jnp.arange(N) < n_out
    p2 = jnp.where(is_out[:, None], p2 + noise, p2)
    return X, R, t, p1, p2, is_out


def test_pnp_dlt_exact():
    key = jax.random.PRNGKey(0)
    X, R, t, _, p2, _ = _two_view(key, N=12, n_out=0)
    T = pnp_mod.solve_pnp_dlt(X[:6], p2[:6])
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-8)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(t), atol=1e-8)


def test_pnp_ransac_rejects_outliers():
    key = jax.random.PRNGKey(1)
    X, R, t, _, p2, is_out = _two_view(key)
    T, mask, count = pnp_mod.find_pnp_matrix(
        jax.random.PRNGKey(2), X, p2, threshold=2.0 / 500.0, n_hyp=128
    )
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-6)
    np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(t), atol=1e-6)
    m = np.asarray(mask)
    out = np.asarray(is_out)
    assert m[~out].all()          # all true inliers kept
    assert not m[out].any()       # all planted outliers rejected


def test_pnp_parsac_updates_confidences():
    key = jax.random.PRNGKey(3)
    X, R, t, _, p2, is_out = _two_view(key)
    conf0 = parsac_mod.initial_bin_confidences(jnp.float64)
    T, mask, count, conf = pnp_mod.find_pnp_matrix_parsac(
        jax.random.PRNGKey(4), X, p2, conf0, threshold=2.0 / 500.0, n_hyp=128
    )
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-6)
    assert conf.shape == (parsac_mod.N_BINS,)
    # bins holding only outliers get low confidence; some inlier bin is high
    assert float(conf.max()) > 0.9
    m = np.asarray(mask)
    assert m[~np.asarray(is_out)].all()


def test_imu_parsac_prior_gate():
    key = jax.random.PRNGKey(5)
    X, R, t, _, p2, is_out = _two_view(key)
    prior_T = jnp.eye(4, dtype=jnp.float64).at[:3, :3].set(R).at[:3, 3].set(t)
    conf0 = parsac_mod.initial_bin_confidences(jnp.float64)
    lens = jnp.full((X.shape[0],), 10, dtype=jnp.int32)
    T, mask, overlap, conf, ok = pnp_mod.find_pnp_matrix_parsac_imu(
        jax.random.PRNGKey(6), X, p2, lens, prior_T, conf0,
        dynamic_prob=0.3, threshold=2.0 / 500.0, n_hyp=128,
    )
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R), atol=1e-6)
    # with a hopeless prior, the gate trips and returns the prior pose
    bad_prior = jnp.eye(4, dtype=jnp.float64).at[:3, 3].set(jnp.asarray([5.0, 5.0, 5.0]))
    T2, mask2, _, conf2, ok2 = pnp_mod.find_pnp_matrix_parsac_imu(
        jax.random.PRNGKey(7), X, p2, lens, bad_prior, conf0,
        dynamic_prob=0.3, threshold=2.0 / 500.0, n_hyp=64,
    )
    assert not bool(ok2)
    np.testing.assert_allclose(np.asarray(T2), np.asarray(bad_prior))
    assert np.asarray(mask2).all()  # degraded: every valid point inlier
    np.testing.assert_allclose(np.asarray(conf2), np.asarray(conf0))


def test_find_essential_matrix():
    key = jax.random.PRNGKey(8)
    X, R, t, p1, p2, is_out = _two_view(key, N=60, n_out=10)
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=-1)
    E, mask, count = stereo_mod.find_essential_matrix(
        jax.random.PRNGKey(9), x1, x2, threshold=1.0 / 500.0, n_hyp=32
    )
    # E ~ [t]x R up to scale; check epipolar residuals of true inliers
    from xrslam_tpu.geometry.essential import essential_geometric_error
    errs = np.asarray(essential_geometric_error(E, x1, x2))
    inl = ~np.asarray(is_out)
    assert np.median(errs[inl]) < 1e-10
    m = np.asarray(mask)
    assert m[inl].mean() > 0.95
    assert not m[np.asarray(is_out)].any()


def test_find_homography_matrix_planar():
    key = jax.random.PRNGKey(10)
    # planar scene: z = 5 plane
    k1, k2 = jax.random.split(key)
    Xxy = jax.random.uniform(k1, (50, 2), minval=-2.0, maxval=2.0)
    X = jnp.concatenate([Xxy, jnp.full((50, 1), 5.0)], axis=-1)
    R = lie.quat_to_matrix(lie.expmap(jnp.asarray([0.05, -0.02, 0.1], dtype=jnp.float64)))
    t = jnp.asarray([0.3, -0.1, 0.2], dtype=jnp.float64)
    X2 = X @ R.T + t
    p1 = X[:, :2] / X[:, 2:3]
    p2 = X2[:, :2] / X2[:, 2:3]
    noise = jax.random.uniform(k2, (50, 2), minval=-0.3, maxval=0.3)
    is_out = jnp.arange(50) < 8
    p2n = jnp.where(is_out[:, None], p2 + noise, p2)
    H, mask, count = stereo_mod.find_homography_matrix(
        jax.random.PRNGKey(11), p1, p2n, threshold=1.0 / 500.0, n_hyp=64
    )
    from xrslam_tpu.geometry.homography import homography_geometric_error
    errs = np.asarray(homography_geometric_error(H, p1, p2))
    assert np.median(errs[~np.asarray(is_out)]) < 1e-12
    assert np.asarray(mask)[~np.asarray(is_out)].all()


def test_find_rotation_matrix():
    key = jax.random.PRNGKey(12)
    k1, k2 = jax.random.split(key)
    b1 = jax.random.normal(k1, (40, 3), dtype=jnp.float64)
    b1 = b1 / jnp.linalg.norm(b1, axis=-1, keepdims=True)
    R = lie.quat_to_matrix(lie.expmap(jnp.asarray([0.2, 0.1, -0.3], dtype=jnp.float64)))
    b2 = b1 @ R.T
    # outliers: random bearings
    bo = jax.random.normal(k2, (40, 3), dtype=jnp.float64)
    bo = bo / jnp.linalg.norm(bo, axis=-1, keepdims=True)
    is_out = jnp.arange(40) < 6
    b2 = jnp.where(is_out[:, None], bo, b2)
    Rest, mask, count = stereo_mod.find_rotation_matrix(
        jax.random.PRNGKey(13), b1, b2, threshold=jnp.sqrt(0.001 / 5.99), n_hyp=64
    )
    np.testing.assert_allclose(np.asarray(Rest), np.asarray(R), atol=1e-8)
    assert np.asarray(mask)[~np.asarray(is_out)].all()


def _dynamic_object_scene(key, n_static=100, n_obj=130):
    """Two-view scene with a rigidly-moving object: static points spread
    over the image, object points clustered in one corner and moving
    with their own transform so they are consistent with a *different*
    essential matrix. The object set is the larger one, so count-based
    RANSAC prefers the wrong model; PARSAC's coverage score must not."""
    k1, k2 = jax.random.split(key)
    Xs = jax.random.uniform(k1, (n_static, 3), minval=-2.0, maxval=2.0
                            ).at[:, 2].add(6.0)
    # object: world points in a narrow frustum (projects to one corner)
    Xo = jax.random.uniform(k2, (n_obj, 3), minval=2.0, maxval=3.2
                            ).at[:, 2].add(3.0)
    R = lie.quat_to_matrix(lie.expmap(jnp.asarray([0.05, -0.02, 0.03],
                                                  dtype=jnp.float64)))
    t = jnp.asarray([0.5, 0.1, -0.1], dtype=jnp.float64)
    # object's own rigid motion in the world between the two views
    Ro = lie.quat_to_matrix(lie.expmap(jnp.asarray([-0.04, 0.08, 0.02],
                                                   dtype=jnp.float64)))
    to = jnp.asarray([-0.3, 0.25, 0.15], dtype=jnp.float64)
    X = jnp.concatenate([Xs, Xo], axis=0)
    X2s = Xs @ R.T + t
    X2o = (Xo @ Ro.T + to) @ R.T + t
    X2 = jnp.concatenate([X2s, X2o], axis=0)
    p1 = X[:, :2] / X[:, 2:3]
    p2 = X2[:, :2] / X2[:, 2:3]
    is_obj = jnp.arange(n_static + n_obj) >= n_static
    return p1, p2, R, t, is_obj


def test_essential_parsac_beats_ransac_on_clustered_object():
    """The RD-VIO motivation scene (reference stereo.cpp:124-155 +
    parsac.h ComputeScore): a dominant clustered dynamic object must not
    win the model selection under PARSAC's spatial-coverage score, while
    plain count-based RANSAC picks it."""
    p1, p2, R, t, is_obj = _dynamic_object_scene(jax.random.PRNGKey(20))
    x1 = jnp.concatenate([p1, jnp.ones_like(p1[:, :1])], axis=-1)
    x2 = jnp.concatenate([p2, jnp.ones_like(p2[:, :1])], axis=-1)
    obj = np.asarray(is_obj)

    # plain RANSAC picks the (larger) object set
    _, mask_r, _ = stereo_mod.find_essential_matrix(
        jax.random.PRNGKey(21), x1, x2, threshold=1.0 / 500.0, n_hyp=64)
    mask_r = np.asarray(mask_r)
    assert mask_r[obj].mean() > mask_r[~obj].mean()

    # PARSAC picks the spatially-spread static set
    conf0 = parsac_mod.initial_bin_confidences(jnp.float64)
    E, mask_p, count, conf = stereo_mod.find_essential_matrix_parsac(
        jax.random.PRNGKey(22), x1, x2, conf0,
        threshold=1.0 / 500.0, norm_scale=2.0, n_hyp=64)
    mask_p = np.asarray(mask_p)
    assert mask_p[~obj].mean() > 0.9
    assert mask_p[obj].mean() < 0.2
    from xrslam_tpu.geometry.essential import essential_geometric_error
    errs = np.asarray(essential_geometric_error(E, x1, x2))
    assert np.median(errs[~obj]) < 1e-10
    # bin-confidence state updated: bins with data get score-implied conf
    conf = np.asarray(conf)
    assert conf.shape == (400,)
    assert (conf > 0).any()


def test_homography_parsac_planar():
    """find_homography_matrix_parsac (reference stereo.cpp:157-183):
    recovers the plane homography under clustered outliers and returns
    updated bin confidences."""
    key = jax.random.PRNGKey(24)
    k1, k2 = jax.random.split(key)
    Xxy = jax.random.uniform(k1, (80, 2), minval=-2.0, maxval=2.0)
    X = jnp.concatenate([Xxy, jnp.full((80, 1), 5.0)], axis=-1)
    R = lie.quat_to_matrix(lie.expmap(jnp.asarray([0.05, -0.02, 0.1],
                                                  dtype=jnp.float64)))
    t = jnp.asarray([0.3, -0.1, 0.2], dtype=jnp.float64)
    X2 = X @ R.T + t
    p1 = X[:, :2] / X[:, 2:3]
    p2 = X2[:, :2] / X2[:, 2:3]
    noise = jax.random.uniform(k2, (80, 2), minval=-0.3, maxval=0.3)
    noise = jnp.sign(noise) * (0.05 + jnp.abs(noise))
    is_out = jnp.arange(80) < 12
    p2n = jnp.where(is_out[:, None], p2 + noise, p2)
    conf0 = parsac_mod.initial_bin_confidences(jnp.float64)
    H, mask, count, conf = stereo_mod.find_homography_matrix_parsac(
        jax.random.PRNGKey(25), p1, p2n, conf0,
        threshold=1.0 / 500.0, n_hyp=64)
    from xrslam_tpu.geometry.homography import homography_geometric_error
    errs = np.asarray(homography_geometric_error(H, p1, p2))
    out = np.asarray(is_out)
    assert np.median(errs[~out]) < 1e-10
    assert np.asarray(mask)[~out].mean() > 0.95
    assert np.asarray(conf).shape == (400,)
