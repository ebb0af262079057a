"""Fused reprojection-block assembly (Gram formulation).

The default `assemble` builds the reprojection contribution to the GN
normal equations with a stack of ~8 one-hot einsums
(solver.py:103-118). This module provides two alternative backends for
the same math, A/B-able via XR_ASSEMBLE_BACKEND (tools/ab_assemble.py
records the comparison; see AB_ASSEMBLE_r04.json):

- `reproj_gram_xla`: the augmented-Jacobian Gram reformulation — build
  the dense pose-column Jacobian Ap[k,l,r, m,i] = δ(k,m)·Jt + R1[l,m]·
  Jr6 once, then ONE (KL2×6K)ᵀ(KL2×6K) matmul yields the whole pose
  Hessian block; landmark terms stay per-column (each residual row
  touches exactly one inverse depth, so the landmark-landmark block is
  diagonal — the structure Ceres SPARSE_SCHUR exploits, reference
  solver.cpp:176-190, and the hand-rolled LandmarkInfo elimination,
  ceres/marginalization_factor.h:382-397).

- `reproj_gram_pallas`: one Pallas TPU kernel computing every output
  (pose Hessian, mixed frame-landmark block, landmark diagonal, both
  gradients) in a single pass over landmark tiles — the fused
  "Jacobian outer-product + landmark-Schur-ready reduction" kernel.
  Stays inside the feature envelope this environment's remote compiler
  supports (PALLAS_PROBE_r04.json): static block specs, no dynamic
  DMA.

Both return the REPROJECTION CONTRIBUTION ONLY, with the layout the
solver adds into its accumulators:
  (P (K,6,K,6), b6 (K,6), Hll (L,), Hfl6 (K,6,L), bl (L,))
from already Cauchy-weighted inputs (r, Jt, Jr6, Jd — see
factors.reproj_residual_jac) and the masked anchor one-hot R1 (L,K).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def backend_choice() -> str:
    """Reprojection-assembly backend: "einsum" (default), "gram"
    (XLA Gram reformulation) or "pallas" (fused TPU kernel)."""
    forced = os.environ.get("XR_ASSEMBLE_BACKEND")
    if forced in ("einsum", "gram", "pallas"):
        return forced
    return "einsum"


# --------------------------------------------------------------------------
# XLA Gram formulation
# --------------------------------------------------------------------------

def reproj_gram_xla(r, Jt, Jr6, Jd, R1):
    K, L = r.shape[:2]
    dt = r.dtype
    eyeK = jnp.eye(K, dtype=dt)
    # Ap[k,l,r,m,i]: d r_{klr} / d pose-entry (m,i)
    Ap = (jnp.einsum("km,klri->klrmi", eyeK, Jt)
          + jnp.einsum("lm,klri->klrmi", R1, Jr6))
    Ap2 = Ap.reshape(K * L * 2, K * 6)
    H6 = (Ap2.T @ Ap2).reshape(K, 6, K, 6)
    b6 = (Ap2.T @ r.reshape(-1)).reshape(K, 6)
    Hfl6 = jnp.einsum("klrmi,klr->mil", Ap, Jd)
    Hll = jnp.einsum("klr,klr->l", Jd, Jd)
    bl = jnp.einsum("klr,klr->l", Jd, r)
    return H6, b6, Hll, Hfl6, bl


# --------------------------------------------------------------------------
# Pallas fused kernel
# --------------------------------------------------------------------------

def _col_block(X, Xexp, K):
    """(6K, TL) column block Σ_r Ap[k,l,r,(m,i)]·w[k,l,r] for a
    row-aligned weight expansion Xexp (the shared structure of the
    frame-landmark block [w=Jd] and the gradient columns [w=r]):
    target part folds r within each frame's 12 rows; ref part routes
    the Y-side sums through the anchor one-hot."""
    XW = X * Xexp
    folded = []
    for k in range(K):
        folded.append(XW[k * 12:k * 12 + 6, :]
                      + XW[k * 12 + 6:k * 12 + 12, :])
    return jnp.concatenate(folded, axis=0)                 # (6K, TL)


def _kernel(x_ref, y_ref, y2_ref, d_ref, rr_ref, o_ref_in, de_ref, re_ref,
            d2_ref, r2_ref,
            h6_ref, hrr_ref, hfl_ref, bmat_ref, hll_ref,
            *, K: int, TL: int):
    """One landmark tile: accumulate the pose Gram, emit the tile's
    landmark columns.

    Row layouts (built by the wrapper; compiled Mosaic rejects strided
    value slices like Y[i::6], so every grouping the kernel needs is
    pre-laid-out contiguously):
      x/y   (K*12, TL)  Jt/Jr6 rows ordered (k, r, i)
      y2    (6*K*2, TL) Jr6 rows ordered (i, k, r)  — i-major twin
      d/rr  (K*2,  TL)  Jd / residual rows ordered (k, r)
      o     (K,    TL)  anchor one-hot (R1ᵀ), landmark-masked
      de/re (K*12, TL)  Jd / residual repeated per i (row-aligned w/ x)
      d2/r2 (6*K*2, TL) Jd / residual tiled i-major (row-aligned w/ y2)
    Outputs:
      h6   (6K, 6K)    target-target + target-ref pose Hessian blocks —
                       revisited, accumulated
      hrr  (36K, K)    ref-ref blocks, (i,j)-block-major: rows
                       [(i*6+j)*K : +K] hold the (K,K) matrix of
                       H[6m+i, 6m'+j] — wrapper un-permutes
      hfl  (6K, TL)    frame-landmark block — per-tile columns
      bmat (6K, TL)    per-landmark gradient columns (wrapper sums)
      hll  (8, TL)     row 0: landmark diagonal, row 1: landmark grad
    """
    @pl.when(pl.program_id(0) == 0)
    def _init():
        h6_ref[...] = jnp.zeros_like(h6_ref)
        hrr_ref[...] = jnp.zeros_like(hrr_ref)

    X = x_ref[...]
    Y = y_ref[...]
    Y2 = y2_ref[...]
    O = o_ref_in[...]
    De = de_ref[...]
    Re = re_ref[...]
    dt = X.dtype

    # ---- target-target: diag-k 6x6 blocks of X Xᵀ (sum over r) ----
    G = jnp.dot(X, X.T, preferred_element_type=dt)
    for k in range(K):
        base = k * 12
        blk = (G[base:base + 6, base:base + 6]
               + G[base + 6:base + 12, base + 6:base + 12])
        h6_ref[6 * k:6 * k + 6, 6 * k:6 * k + 6] += blk

    # ---- target-ref cross terms, one masked matmul per ref frame ----
    for m in range(K):
        Zm = Y * O[m:m + 1, :]
        Gm = jnp.dot(X, Zm.T, preferred_element_type=dt)
        for k in range(K):
            base = k * 12
            blk = (Gm[base:base + 6, base:base + 6]
                   + Gm[base + 6:base + 12, base + 6:base + 12])
            h6_ref[6 * k:6 * k + 6, 6 * m:6 * m + 6] += blk
            h6_ref[6 * m:6 * m + 6, 6 * k:6 * k + 6] += blk.T

    # ---- ref-ref: per-landmark 6x6 outer products folded through O ----
    # S_ij(l) = Σ_{k,r} Y[(k,r,i),l]·Y[(k,r,j),l]; H_rr = (O∘S_ij) Oᵀ
    for i in range(6):
        Yi = Y2[i * 2 * K:(i + 1) * 2 * K, :]             # rows (k,r)
        for j in range(i, 6):
            Yj = Y2[j * 2 * K:(j + 1) * 2 * K, :]
            S = jnp.sum(Yi * Yj, axis=0, keepdims=True)   # (1, TL)
            W = jnp.dot(O * S, O.T, preferred_element_type=dt)  # (K, K)
            hrr_ref[(i * 6 + j) * K:(i * 6 + j + 1) * K, :] += W
            if j != i:
                hrr_ref[(j * 6 + i) * K:(j * 6 + i + 1) * K, :] += W.T

    # ---- ref-side lane sums shared by hfl/bmat ----
    def ref_cols(W2exp):
        YW = Y2 * W2exp
        T = jnp.concatenate(
            [jnp.sum(YW[i * 2 * K:(i + 1) * 2 * K, :], axis=0,
                     keepdims=True) for i in range(6)], axis=0)  # (6, TL)
        fr = [O[m:m + 1, :] * T for m in range(K)]
        return jnp.concatenate(fr, axis=0)                 # (6K, TL)

    hfl_ref[...] = _col_block(X, De, K) + ref_cols(d2_ref[...])
    bmat_ref[...] = _col_block(X, Re, K) + ref_cols(r2_ref[...])

    # ---- landmark diagonal + gradient ---- (direct ref row writes:
    # value-level .at[].set scatters don't lower in compiled Mosaic)
    D = d_ref[...]
    Rr = rr_ref[...]
    hll_ref[0:1, :] = jnp.sum(D * D, axis=0, keepdims=True)
    hll_ref[1:2, :] = jnp.sum(D * Rr, axis=0, keepdims=True)
    hll_ref[2:8, :] = jnp.zeros((6, TL), dt)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def reproj_gram_pallas(r, Jt, Jr6, Jd, R1, tile: int = 128,
                       interpret: bool = False):
    """Fused single-kernel reprojection assembly (TPU; interpret=True
    runs the kernel in the Pallas interpreter for CPU parity tests)."""
    K, L = r.shape[:2]
    dt = r.dtype
    assert L % tile == 0, (L, tile)

    # row layouts (k, r, i) / (i, k, r) / (k, r): cheap XLA transposes
    # feeding the kernel well-tiled (rows, L) operands — every grouping
    # is contiguous because compiled Mosaic rejects strided slices
    X = Jt.transpose(0, 2, 3, 1).reshape(K * 12, L)
    Y = Jr6.transpose(0, 2, 3, 1).reshape(K * 12, L)
    Y2 = Jr6.transpose(3, 0, 2, 1).reshape(6 * K * 2, L)  # i-major
    D = Jd.transpose(0, 2, 1).reshape(K * 2, L)
    Rr = r.transpose(0, 2, 1).reshape(K * 2, L)
    O = R1.T.astype(dt)                                   # (K, L)
    De = jnp.repeat(D, 6, axis=0)                         # row-aligned w/ X
    Re = jnp.repeat(Rr, 6, axis=0)
    D2 = jnp.tile(D, (6, 1))                              # row-aligned w/ Y2
    R2 = jnp.tile(Rr, (6, 1))

    grid = (L // tile,)
    kern = functools.partial(_kernel, K=K, TL=tile)
    h6, hrr, hfl, bmat, hll = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((K * 12, tile), lambda i: (0, i)),
            pl.BlockSpec((K * 12, tile), lambda i: (0, i)),
            pl.BlockSpec((6 * K * 2, tile), lambda i: (0, i)),
            pl.BlockSpec((K * 2, tile), lambda i: (0, i)),
            pl.BlockSpec((K * 2, tile), lambda i: (0, i)),
            pl.BlockSpec((K, tile), lambda i: (0, i)),
            pl.BlockSpec((K * 12, tile), lambda i: (0, i)),
            pl.BlockSpec((K * 12, tile), lambda i: (0, i)),
            pl.BlockSpec((6 * K * 2, tile), lambda i: (0, i)),
            pl.BlockSpec((6 * K * 2, tile), lambda i: (0, i)),
        ],
        out_specs=[
            pl.BlockSpec((6 * K, 6 * K), lambda i: (0, 0)),   # revisited
            pl.BlockSpec((36 * K, K), lambda i: (0, 0)),      # revisited
            pl.BlockSpec((6 * K, tile), lambda i: (0, i)),
            pl.BlockSpec((6 * K, tile), lambda i: (0, i)),
            pl.BlockSpec((8, tile), lambda i: (0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((6 * K, 6 * K), dt),
            jax.ShapeDtypeStruct((36 * K, K), dt),
            jax.ShapeDtypeStruct((6 * K, L), dt),
            jax.ShapeDtypeStruct((6 * K, L), dt),
            jax.ShapeDtypeStruct((8, L), dt),
        ],
        interpret=interpret,
    )(X, Y, Y2, D, Rr, O, De, Re, D2, R2)

    P = h6.reshape(K, 6, K, 6)
    # un-permute the (i,j)-block-major ref-ref contribution:
    # hrr[(i*6+j)*K + m, m'] = H[6m+i, 6m'+j]
    Hrr = hrr.reshape(6, 6, K, K).transpose(2, 0, 3, 1)   # (K,6,K,6)
    P = P + Hrr
    b6v = jnp.sum(bmat, axis=1).reshape(K, 6)
    Hfl6 = hfl.reshape(K, 6, L)
    return P, b6v, hll[0], Hfl6, hll[1]
