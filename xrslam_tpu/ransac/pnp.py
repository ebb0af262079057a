"""Batched PnP: 6-point DLT minimal solver + RANSAC / PARSAC /
IMU-PARSAC wrappers.

The reference calls OpenCV's EPnP on 6 points
(reference: xrslam/src/xrslam/geometry/pnp.h:12-49) and wraps it in
RANSAC/PARSAC/IMU-PARSAC with χ² thresholds 2·5.99·σ²
(pnp.h:96-208). A 6-point DLT (SVD of the 12×12 projection-matrix
system, R re-orthonormalized by SVD) is algebraically equivalent for
minimal noise-free samples and maps onto batched TPU linear algebra;
the RANSAC consensus step dominates accuracy either way.

Error model (pnp.h:91-95): squared *normalized-plane* reprojection
error ‖x − hnorm(R·X + t)‖².
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import core, parsac


def solve_pnp_dlt(X: jnp.ndarray, x: jnp.ndarray):
    """P from n≥6 correspondences X (n,3) world → x (n,2) normalized
    image, via DLT + orthonormalization. Returns T (4,4) with
    [R|t] on top."""
    n = X.shape[0]
    dt = X.dtype
    Xh = jnp.concatenate([X, jnp.ones((n, 1), dtype=dt)], axis=-1)  # (n,4)
    z = jnp.zeros((n, 4), dtype=dt)
    r1 = jnp.concatenate([Xh, z, -x[:, 0:1] * Xh], axis=-1)  # (n,12)
    r2 = jnp.concatenate([z, Xh, -x[:, 1:2] * Xh], axis=-1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2n,12)
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    p = vt[-1]
    P = p.reshape(3, 4)
    M = P[:, :3]
    # scale & sign: det(R)>0, ‖R‖ = orthonormal
    s = jnp.sign(jnp.linalg.det(M)) / jnp.cbrt(jnp.abs(jnp.linalg.det(M)) + 1e-30)
    P = P * s
    U, sv, Vt = jnp.linalg.svd(P[:, :3])
    R = U @ Vt
    R = R * jnp.sign(jnp.linalg.det(R))
    t = P[:, 3] * 3.0 / jnp.clip(jnp.sum(sv), 1e-12, None)
    T = jnp.eye(4, dtype=dt).at[:3, :3].set(R).at[:3, 3].set(t)
    return T


def pnp_reproject_error(T: jnp.ndarray, X: jnp.ndarray, x: jnp.ndarray):
    """Squared normalized-plane reprojection errors (N,) (reference
    pnp.h:91-95); points behind the camera get +inf."""
    Xc = X @ T[:3, :3].T + T[:3, 3]
    z = Xc[..., 2]
    proj = Xc[..., :2] / jnp.where(jnp.abs(z) < 1e-12, 1e-12, z)[..., None]
    err = jnp.sum((x - proj) ** 2, axis=-1)
    return jnp.where(z > 0, err, jnp.inf)


CHI2_2DOF = 5.99  # t2 (pnp.h:117)


def find_pnp_matrix(key, X, x, valid=None, threshold: float = 1.0,
                    n_hyp: int = 256):
    """RANSAC PnP (reference pnp.h:96-131). Returns (T, inlier_mask,
    count). Threshold: 2·t2·threshold² on squared normalized error."""
    N = X.shape[0]

    def solver(idx, X, x):
        return solve_pnp_dlt(X[idx], x[idx])

    def evaluator(T, X, x):
        return pnp_reproject_error(T, X, x)

    thr = 2.0 * CHI2_2DOF * threshold * threshold
    return core.ransac(key, solver, evaluator, (X, x), N, 6, thr,
                       n_hyp=n_hyp, valid=valid)


def find_pnp_matrix_parsac(key, X, x, bin_conf, valid=None,
                           threshold: float = 1.0, norm_scale: float = 1.0,
                           n_hyp: int = 256):
    """PARSAC PnP (reference pnp.h:133-166): spatial-bin-confidence
    weighted sampling + coverage scoring. Returns
    (T, inlier_mask, count, new_bin_conf)."""
    N = X.shape[0]
    thr = 2.0 * CHI2_2DOF * threshold * threshold

    def solver(idx, X, x):
        return solve_pnp_dlt(X[idx], x[idx])

    def evaluator(T, X, x):
        return pnp_reproject_error(T, X, x)

    return parsac.parsac(key, solver, evaluator, (X, x), x, bin_conf,
                         N, 6, thr, valid=valid, norm_scale=norm_scale,
                         n_hyp=n_hyp)


def find_pnp_matrix_parsac_imu(key, X, x, lens, prior_T, bin_conf,
                               dynamic_prob, valid=None,
                               threshold: float = 1.0,
                               norm_scale: float = 1.0, n_hyp: int = 256):
    """IMU-PARSAC PnP (reference pnp.h:168-208, utility/imu_parsac.h):
    the RD-VIO dynamic-outlier rejector. The IMU-propagated prior pose
    gates hypotheses by inlier overlap; track lengths and the dynamic
    probability weight the bin confidences.

    Returns (T, inlier_mask, count, new_bin_conf, prior_ok). When the
    prior inlier set is too small (imu_parsac.h:192-197: ratio < 0.15
    or < 20), T is the prior pose, every valid point is an inlier, and
    prior_ok is False — the caller treats the frame as untrackable for
    dynamic classification (sliding_window_tracker.cpp:612-634).
    """
    N = X.shape[0]
    thr = 2.0 * CHI2_2DOF * threshold * threshold

    def solver(idx, X, x):
        return solve_pnp_dlt(X[idx], x[idx])

    def evaluator(T, X, x):
        return pnp_reproject_error(T, X, x)

    return parsac.imu_parsac(key, solver, evaluator, (X, x), x, lens,
                             prior_T, bin_conf, dynamic_prob, N, 6, thr,
                             valid=valid, norm_scale=norm_scale, n_hyp=n_hyp)
