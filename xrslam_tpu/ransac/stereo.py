"""Two-view robust estimators: essential (5-pt), homography (4-pt),
rotation (2-pt) RANSAC — batched-hypothesis versions of the reference's
wrappers (reference: xrslam/src/xrslam/geometry/stereo.cpp:38-122).

Thresholds match the reference exactly:
  essential: 2·3.84·σ² on the symmetric squared epipolar error
  homography: 2·5.99·σ² on the symmetric squared transfer error
  rotation:   5.99·σ² on the angular error (radians, NOT squared in the
              evaluator — the reference compares acos(·) against
              t2·threshold², stereo.cpp:80-87)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry import essential as ess
from ..geometry import homography as homo
from ..geometry import wahba
from . import core
from . import parsac as parsac_mod

CHI2_1DOF = 3.84
CHI2_2DOF = 5.99


@partial(jax.jit, static_argnames=("n_hyp",))
def find_essential_matrix(key, x1, x2, valid=None, threshold: float = 1.0,
                          n_hyp: int = 64):
    """Batched 5-pt essential RANSAC (stereo.cpp:38-66). x1, x2: (N,3)
    homogeneous normalized points (z=1). Returns (E, inlier_mask,
    count)."""
    N = x1.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    thr = 2.0 * CHI2_1DOF * threshold * threshold

    idx = core.sample_minimal(key, n_hyp, N, 5, valid)
    E_all, root_valid = jax.vmap(
        lambda i: ess.solve_essential_5pt(x1[i], x2[i])
    )(idx)  # (H,R,3,3), (H,R)
    H_, R_ = root_valid.shape
    E_flat = E_all.reshape(H_ * R_, 3, 3)
    rv = root_valid.reshape(H_ * R_)

    def errs(E):
        return ess.essential_geometric_error(E, x1, x2) + \
            ess.essential_geometric_error(jnp.swapaxes(E, -1, -2), x2, x1)

    errors = jax.vmap(errs)(E_flat)
    errors = jnp.where(rv[:, None], errors, jnp.inf)
    best, mask, count = core.select_best(errors, thr, valid)
    return E_flat[best], mask, count


@partial(jax.jit, static_argnames=("n_hyp",))
def find_homography_matrix(key, p1, p2, valid=None, threshold: float = 1.0,
                           n_hyp: int = 128):
    """Batched 4-pt homography RANSAC (stereo.cpp:96-122). p1, p2:
    (N,2). Returns (H, inlier_mask, count)."""
    N = p1.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    thr = 2.0 * CHI2_2DOF * threshold * threshold

    idx = core.sample_minimal(key, n_hyp, N, 4, valid)
    Hs = jax.vmap(lambda i: homo.solve_homography_4pt(p1[i], p2[i]))(idx)

    def errs(H):
        Hi = jnp.linalg.inv(H)
        return homo.homography_geometric_error(H, p1, p2) + \
            homo.homography_geometric_error(Hi, p2, p1)

    errors = jax.vmap(errs)(Hs)
    best, mask, count = core.select_best(errors, thr, valid)
    return Hs[best], mask, count


@partial(jax.jit, static_argnames=("n_hyp",))
def find_essential_matrix_parsac(key, x1, x2, bin_conf, valid=None,
                                 threshold: float = 1.0,
                                 norm_scale: float = 1.0, n_hyp: int = 64):
    """PARSAC 5-pt essential (reference stereo.cpp:124-155): same
    minimal solver/evaluator as `find_essential_matrix` but with
    spatial-bin-confidence weighted sampling and coverage scoring; the
    reference keeps the 400 bin confidences in a function-static vector
    — here they are explicit state. x1, x2: (N,3) homogeneous z=1
    points; binning uses x2's normalized-plane coordinates. Returns
    (E, inlier_mask, count, new_bin_conf)."""
    N = x1.shape[0]
    thr = 2.0 * CHI2_1DOF * threshold * threshold

    def solver(idx, x1, x2):
        return ess.solve_essential_5pt(x1[idx], x2[idx])  # ((R,3,3),(R,))

    def evaluator(m, x1, x2):
        E, rv = m
        errs = jax.vmap(
            lambda Ei: ess.essential_geometric_error(Ei, x1, x2)
            + ess.essential_geometric_error(jnp.swapaxes(Ei, -1, -2), x2, x1)
        )(E)
        return jnp.where(rv[:, None], errs, jnp.inf)

    model, mask, count, new_conf = parsac_mod.parsac(
        key, solver, evaluator, (x1, x2), x2[..., :2], bin_conf, N, 5, thr,
        valid=valid, norm_scale=norm_scale, n_hyp=n_hyp)
    return model[0], mask, count, new_conf


@partial(jax.jit, static_argnames=("n_hyp",))
def find_homography_matrix_parsac(key, p1, p2, bin_conf, valid=None,
                                  threshold: float = 1.0,
                                  norm_scale: float = 1.0, n_hyp: int = 128):
    """PARSAC 4-pt homography (reference stereo.cpp:157-183). p1, p2:
    (N,2) normalized-plane points. Returns (H, inlier_mask, count,
    new_bin_conf)."""
    N = p1.shape[0]
    thr = 2.0 * CHI2_2DOF * threshold * threshold

    def solver(idx, p1, p2):
        return homo.solve_homography_4pt(p1[idx], p2[idx])

    def evaluator(H, p1, p2):
        Hi = jnp.linalg.inv(H)
        return homo.homography_geometric_error(H, p1, p2) + \
            homo.homography_geometric_error(Hi, p2, p1)

    return parsac_mod.parsac(
        key, solver, evaluator, (p1, p2), p2, bin_conf, N, 4, thr,
        valid=valid, norm_scale=norm_scale, n_hyp=n_hyp)


@partial(jax.jit, static_argnames=("n_hyp",))
def find_rotation_matrix(key, b1, b2, valid=None, threshold: float = 1.0,
                         n_hyp: int = 128):
    """Batched 2-pt rotation RANSAC (stereo.cpp:68-91). b1, b2: (N,3)
    unit bearings, convention b2 ≈ R b1. Returns (R, inlier_mask,
    count)."""
    N = b1.shape[0]
    if valid is None:
        valid = jnp.ones((N,), dtype=bool)
    thr = CHI2_2DOF * threshold * threshold

    idx = core.sample_minimal(key, n_hyp, N, 2, valid)
    Rs = jax.vmap(lambda i: wahba.solve_rotation(b1[i], b2[i]))(idx)
    errors = jax.vmap(lambda R: wahba.rotation_angular_error(R, b1, b2))(Rs)
    best, mask, count = core.select_best(errors, thr, valid)
    return Rs[best], mask, count
