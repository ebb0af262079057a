"""PARSAC / IMU-PARSAC: prior-guided spatial-bin RANSAC as fixed-shape
masked reductions.

Reproduces the reference's semantics (reference:
xrslam/src/xrslam/utility/parsac.h, utility/imu_parsac.h):

  - 20×20 bins over [-scale, scale]² image coordinates; per-bin
    confidence carried across frames (the reference keeps it in
    function-static vectors, stereo.cpp:146-151 / pnp.h:152; here it
    is explicit functional state passed in and out),
  - prior confidences floored at 0.5 and normalized (parsac.h:330-342),
  - confidence-weighted minimal-sample draw (parsac.h:27-41
    Sampler::draw_by_weight; the reference then uses the *bin* index as
    a data index — a bug we do not reproduce: we weight each datum by
    its bin's confidence, which is the PARSAC paper's intent),
  - hypothesis score = spatial coverage of inliers × confidence sum
    (ComputeScore, parsac.h:199-238): per-bin inlier fraction c_b,
    confidence-weighted location covariance C, score =
    sqrt(det C)·Σc_b·Σc_b/((Σc_b)²−Σc_b²),
  - IMU variant (imu_parsac.h): prior-pose inlier gate at 2× threshold
    (:172-199), hypothesis admission by overlap with the prior inlier
    set (:108-121), per-bin mean track length and dynamic-probability
    weight t = 1 − p_dyn^(0.1·len) on bin confidence (:234-236).

Everything is jit-compatible: 400 static bin slots with validity masks
replace the reference's dynamic valid-bin compaction.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import core

N_BINS_X = 20
N_BINS_Y = 20
N_BINS = N_BINS_X * N_BINS_Y
MIN_PRIOR_BIN_CONFIDENCE = 0.5


def initial_bin_confidences(dtype=jnp.float32) -> jnp.ndarray:
    """The reference's `binConfidences(400, 0.5)` initial state."""
    return jnp.full((N_BINS,), 0.5, dtype=dtype)


def bucket_points(pts: jnp.ndarray, norm_scale: float = 1.0) -> jnp.ndarray:
    """Bin index (N,) of each 2-d point over the 20×20 grid spanning
    [-norm_scale, norm_scale]² (parsac.h:290-296)."""
    bw = 2.0 * norm_scale / N_BINS_X
    bh = 2.0 * norm_scale / N_BINS_Y
    ix = jnp.clip(((pts[..., 0] + norm_scale) / bw).astype(jnp.int32), 0, N_BINS_X - 1)
    iy = jnp.clip(((pts[..., 1] + norm_scale) / bh).astype(jnp.int32), 0, N_BINS_Y - 1)
    return ix + N_BINS_X * iy


def bin_locations(norm_scale: float = 1.0, dtype=jnp.float32) -> jnp.ndarray:
    """Bin-center coordinates (400, 2) (parsac.h:247-258)."""
    bw = 2.0 * norm_scale / N_BINS_X
    bh = 2.0 * norm_scale / N_BINS_Y
    xs = (jnp.arange(N_BINS_X, dtype=dtype) + 0.5) * bw - norm_scale
    ys = (jnp.arange(N_BINS_Y, dtype=dtype) + 0.5) * bh - norm_scale
    gx, gy = jnp.meshgrid(xs, ys)
    return jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)


def _bin_stats(bin_idx, valid, dtype):
    """(count per bin, bin-has-data mask)."""
    w = valid.astype(dtype)
    cnt = jnp.zeros((N_BINS,), dtype=dtype).at[bin_idx].add(w)
    return cnt, cnt > 0


def point_weights(bin_idx, bin_conf, valid, dtype=jnp.float32):
    """Per-point sampling weight = normalized prior confidence of its
    bin, floored at 0.5 (parsac.h:330-342). Each datum in a bin draws
    with that bin's confidence (see module docstring re the reference's
    index bug)."""
    conf = jnp.maximum(bin_conf.astype(dtype), MIN_PRIOR_BIN_CONFIDENCE)
    cnt, has = _bin_stats(bin_idx, valid, dtype)
    conf = jnp.where(has, conf, 0.0)
    # bin weight spread over its members so each *bin* (not datum) has
    # prior-proportional mass, matching the reference's bin-level draw
    per_point = conf[bin_idx] / jnp.clip(cnt[bin_idx], 1.0, None)
    return jnp.where(valid, per_point, 0.0)


def parsac_score(inlier_mask, valid, bin_idx, locations, bin_count,
                 bin_has_data, len_weight=None):
    """Coverage × confidence score of one hypothesis and the per-bin
    confidences it implies (ComputeScore, parsac.h:199-238)."""
    dt = locations.dtype
    w = (inlier_mask & valid).astype(dt)
    inl_per_bin = jnp.zeros((N_BINS,), dtype=dt).at[bin_idx].add(w)
    c = jnp.where(bin_has_data, inl_per_bin / jnp.clip(bin_count, 1.0, None), 0.0)
    if len_weight is not None:
        c = c * len_weight
    csum = jnp.sum(c)
    csq = jnp.sum(c * c)
    mean = jnp.sum(locations * c[:, None], axis=0) / jnp.clip(csum, 1e-12, None)
    d = locations - mean[None, :]
    Cxx = jnp.sum(d[:, 0] * d[:, 0] * c)
    Cxy = jnp.sum(d[:, 0] * d[:, 1] * c)
    Cyy = jnp.sum(d[:, 1] * d[:, 1] * c)
    norm = csum / jnp.clip(csum * csum - csq, 1e-12, None)
    img_ratio = norm * jnp.sqrt(jnp.clip(Cxx * Cyy - Cxy * Cxy, 0.0, None))
    return img_ratio * csum, c


def _finish_confidences(best_c, bin_has_data):
    """New cross-frame bin-confidence state: score-implied confidences
    on bins with data, 0 elsewhere (parsac.h:179-183,316-327)."""
    return jnp.where(bin_has_data, best_c, 0.0)


def parsac(key, solver, evaluator, data, pts2, bin_conf, n_points, dof,
           threshold, valid=None, norm_scale: float = 1.0, n_hyp: int = 256):
    """Batched PARSAC (parsac.h:58-176). Returns
    (model, inlier_mask, inlier_count, new_bin_conf)."""
    dt = pts2.dtype
    if valid is None:
        valid = jnp.ones((n_points,), dtype=bool)
    bin_idx = bucket_points(pts2, norm_scale)
    locs = bin_locations(norm_scale, dtype=dt)
    bin_count, bin_has = _bin_stats(bin_idx, valid, dt)
    weights = point_weights(bin_idx, bin_conf, valid, dtype=dt)

    idx = core.sample_minimal(key, n_hyp, n_points, dof, valid, weights)
    models = jax.vmap(lambda i: solver(i, *data))(idx)
    errors = jax.vmap(lambda m: evaluator(m, *data))(models)
    if errors.ndim == 3:
        H, V, N = errors.shape
        errors = errors.reshape(H * V, N)
        models = jax.tree.map(lambda m: m.reshape((H * V,) + m.shape[2:]), models)

    inl = (errors <= threshold) & valid[None, :]
    scores, cs = jax.vmap(
        lambda im: parsac_score(im, valid, bin_idx, locs, bin_count, bin_has)
    )(inl)
    counts = jnp.sum(inl, axis=-1)
    # score primary, inlier count tie-break (parsac.h:154-156)
    best = jnp.argmax(scores + 1e-9 * counts.astype(dt))
    model = jax.tree.map(lambda m: m[best], models)
    new_conf = _finish_confidences(cs[best], bin_has)
    return model, inl[best], counts[best], new_conf


def imu_parsac(key, solver, evaluator, data, pts2, lens, prior_T, bin_conf,
               dynamic_prob, n_points, dof, threshold, valid=None,
               norm_scale: float = 1.0, n_hyp: int = 256,
               min_prior_inliers: int = 20, min_prior_ratio: float = 0.15):
    """Batched IMU-PARSAC (imu_parsac.h:12-160). Returns
    (model, inlier_mask, overlap_count, new_bin_conf, prior_ok)."""
    dt = pts2.dtype
    if valid is None:
        valid = jnp.ones((n_points,), dtype=bool)
    n_valid = jnp.sum(valid)
    bin_idx = bucket_points(pts2, norm_scale)
    locs = bin_locations(norm_scale, dtype=dt)
    bin_count, bin_has = _bin_stats(bin_idx, valid, dt)
    weights = point_weights(bin_idx, bin_conf, valid, dtype=dt)

    # prior inlier distribution at 2× threshold (imu_parsac.h:172-199)
    prior_err = evaluator(prior_T, *data)
    prior_inl = (prior_err <= 2.0 * threshold) & valid
    n_prior = jnp.sum(prior_inl)
    prior_ok = (n_prior >= min_prior_inliers) & (
        n_prior.astype(dt) >= min_prior_ratio * jnp.clip(n_valid.astype(dt), 1.0, None)
    )

    # per-bin mean track length → dynamic weight t = 1 − p^(0.1·len)
    # (imu_parsac.h:234-236,291-322)
    lens_f = lens.astype(dt) * valid.astype(dt)
    bin_len = jnp.zeros((N_BINS,), dtype=dt).at[bin_idx].add(lens_f)
    bin_len = jnp.where(bin_has, bin_len / jnp.clip(bin_count, 1.0, None), 0.0)
    p = jnp.clip(jnp.asarray(dynamic_prob, dtype=dt), 0.0, 1.0 - 1e-6)
    len_w = 1.0 - jnp.power(p, 0.10 * bin_len)

    idx = core.sample_minimal(key, n_hyp, n_points, dof, valid, weights)
    models = jax.vmap(lambda i: solver(i, *data))(idx)
    errors = jax.vmap(lambda m: evaluator(m, *data))(models)
    if errors.ndim == 3:
        H, V, N = errors.shape
        errors = errors.reshape(H * V, N)
        models = jax.tree.map(lambda m: m.reshape((H * V,) + m.shape[2:]), models)

    inl = (errors <= threshold) & valid[None, :]
    overlap = jnp.sum(inl & prior_inl[None, :], axis=-1)
    admissible = overlap >= dof  # (imu_parsac.h:119-121)
    scores, cs = jax.vmap(
        lambda im: parsac_score(im, valid, bin_idx, locs, bin_count, bin_has, len_w)
    )(inl)
    scores = jnp.where(admissible, scores, -jnp.inf)
    best = jnp.argmax(scores + 1e-9 * overlap.astype(dt))
    found = jnp.isfinite(scores[best]) & (overlap[best] >= dof) & prior_ok

    model_best = jax.tree.map(lambda m: m[best], models)
    model = jnp.where(found, model_best, prior_T)
    mask = jnp.where(found, inl[best], valid)  # fallback: all valid inliers
    new_conf = jnp.where(found, _finish_confidences(cs[best], bin_has), bin_conf)
    return model, mask, overlap[best], new_conf, prior_ok & found
