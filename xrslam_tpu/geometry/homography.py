"""4-point homography: normalized DLT solve + SVD-free decomposition.

reference: xrslam/src/xrslam/geometry/homography.{h,cpp} — Hartley
normalization, 8×9 DLT nullspace (homography.cpp:90-158), and the
closed-form decomposition into two (R,T,n) hypotheses with
pure-rotation detection (homography.cpp:5-87). All functions are
batched over leading dims and jit/vmap-safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def solve_homography_4pt(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """DLT with Hartley normalization; p1, p2: (...,4,2) normalized image
    points; returns H (...,3,3) with p2 ~ H p1."""
    mean1 = jnp.mean(p1, axis=-2, keepdims=True)
    mean2 = jnp.mean(p2, axis=-2, keepdims=True)
    s1 = jnp.sum(jnp.linalg.norm(p1 - mean1, axis=-1), axis=-1)
    s2 = jnp.sum(jnp.linalg.norm(p2 - mean2, axis=-1), axis=-1)
    sa = 1.0 / (jnp.sqrt(2.0) * jnp.maximum(s1, 1e-12))[..., None, None]
    sb = 1.0 / (jnp.sqrt(2.0) * jnp.maximum(s2, 1e-12))[..., None, None]
    na = (p1 - mean1) * sa
    nb = (p2 - mean2) * sb

    ax, ay = na[..., 0], na[..., 1]
    bx, by = nb[..., 0], nb[..., 1]
    zero = jnp.zeros_like(ax)
    one = jnp.ones_like(ax)
    # rows as in the reference (homography.cpp:95-113)
    row_even = jnp.stack(
        [zero, -ax, ax * by, zero, -ay, ay * by, zero, -one, by], axis=-1
    )
    row_odd = jnp.stack(
        [ax, zero, -ax * bx, ay, zero, -ay * bx, one, zero, -bx], axis=-1
    )
    A = jnp.concatenate([row_even, row_odd], axis=-2)  # (...,8,9)
    ata = jnp.einsum("...ij,...ik->...jk", A, A)
    _, v = jnp.linalg.eigh(ata)
    h = v[..., :, 0]
    # the DLT rows index h in column-major (Eigen) layout — reference
    # homography.cpp to_matrix fills columns — so transpose after the
    # row-major reshape
    NH = jnp.swapaxes(h.reshape(h.shape[:-1] + (3, 3)), -1, -2)

    sa_ = sa[..., 0, 0]
    sb_ = sb[..., 0, 0]
    Nb = jnp.zeros(NH.shape, dtype=NH.dtype)
    Nb = Nb.at[..., 0, 0].set(1.0 / sb_).at[..., 1, 1].set(1.0 / sb_).at[..., 2, 2].set(1.0)
    Nb = Nb.at[..., 0, 2].set(mean2[..., 0, 0]).at[..., 1, 2].set(mean2[..., 0, 1])
    Na = jnp.zeros(NH.shape, dtype=NH.dtype)
    Na = Na.at[..., 0, 0].set(sa_).at[..., 1, 1].set(sa_).at[..., 2, 2].set(1.0)
    Na = Na.at[..., 0, 2].set(-sa_ * mean1[..., 0, 0]).at[..., 1, 2].set(-sa_ * mean1[..., 0, 1])
    return Nb @ NH @ Na


def homography_geometric_error(H: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Squared transfer error d(p2, H·p1)² (reference homography.h:17-22).
    H (...,3,3), p1/p2 (...,N,2) -> (...,N)."""
    ph = jnp.concatenate([p1, jnp.ones_like(p1[..., :1])], axis=-1)
    hp = jnp.einsum("...ij,...nj->...ni", H, ph)
    proj = hp[..., :2] / hp[..., 2:3]
    return jnp.sum((p2 - proj) ** 2, axis=-1)


def decompose_homography(H: jnp.ndarray):
    """Closed-form decomposition (reference homography.cpp:5-87).

    Returns (R1, R2, T1, T2, n1, n2, is_pure_rotation). Batched.
    """
    sv = jnp.linalg.svd(H, compute_uv=False)
    Hn = H / sv[..., 1][..., None, None]
    S = jnp.swapaxes(Hn, -1, -2) @ Hn - jnp.eye(3, dtype=H.dtype)
    pure = jnp.max(jnp.abs(S), axis=(-2, -1)) <= 1e-3

    # pure-rotation branch: nearest rotation via SVD
    U, _, Vt = jnp.linalg.svd(H)
    R_pure = U @ Vt
    detR = jnp.linalg.det(R_pure)
    R_pure = R_pure * jnp.sign(detR)[..., None, None]

    s00, s01, s02 = S[..., 0, 0], S[..., 0, 1], S[..., 0, 2]
    s11, s12, s22 = S[..., 1, 1], S[..., 1, 2], S[..., 2, 2]
    Ms00 = jnp.maximum(s12 * s12 - s11 * s22, 0.0)
    Ms11 = jnp.maximum(s02 * s02 - s00 * s22, 0.0)
    Ms22 = jnp.maximum(s01 * s01 - s00 * s11, 0.0)
    r00, r11, r22 = jnp.sqrt(Ms00), jnp.sqrt(Ms11), jnp.sqrt(Ms22)
    tr = s00 + s11 + s22
    nu = 2.0 * jnp.sqrt(jnp.maximum(1.0 + tr - Ms00 - Ms11 - Ms22, 1e-12))
    tenormsq = 2.0 + tr - nu

    def _branch(major):
        if major == 0:
            eps = jnp.sign(jnp.where(s01 * s02 - s00 * s12 < 0, -1.0, 1.0))
            n1 = jnp.stack([s00, s01 + r22, s02 + eps * r11], axis=-1)
            n2 = jnp.stack([s00, s01 - r22, s02 - eps * r11], axis=-1)
            d = s00
        elif major == 1:
            eps = jnp.sign(jnp.where(s11 * s02 - s01 * s12 < 0, -1.0, 1.0))
            n1 = jnp.stack([s01 + r22, s11, s12 - eps * r00], axis=-1)
            n2 = jnp.stack([s01 - r22, s11, s12 + eps * r00], axis=-1)
            d = s11
        else:
            eps = jnp.sign(jnp.where(s12 * s02 - s01 * s22 < 0, -1.0, 1.0))
            n1 = jnp.stack([s02 + eps * r11, s12 + r00, s22], axis=-1)
            n2 = jnp.stack([s02 - eps * r11, s12 - r00, s22], axis=-1)
            d = s22
        d = jnp.where(jnp.abs(d) < 1e-12, 1e-12, d)
        t1 = jnp.linalg.norm(n1, axis=-1, keepdims=True) * n2 / d[..., None]
        t2 = jnp.linalg.norm(n2, axis=-1, keepdims=True) * n1 / d[..., None]
        return n1, n2, t1, t2

    # branchless selection of the largest diagonal element
    b0 = _branch(0)
    b1 = _branch(1)
    b2 = _branch(2)
    use0 = (s00 > s11) & (s00 > s22)
    use1 = (s11 > s00) & (s11 > s22) & ~use0

    def sel(i):
        return jnp.where(
            use0[..., None], b0[i], jnp.where(use1[..., None], b1[i], b2[i])
        )

    n1, n2, tstar1, tstar2 = sel(0), sel(1), sel(2), sel(3)
    n1 = n1 / jnp.maximum(jnp.linalg.norm(n1, axis=-1, keepdims=True), 1e-12)
    n2 = n2 / jnp.maximum(jnp.linalg.norm(n2, axis=-1, keepdims=True), 1e-12)
    tstar1 = tstar1 - tenormsq[..., None] * n1
    tstar2 = tstar2 - tenormsq[..., None] * n2
    eye = jnp.eye(3, dtype=H.dtype)
    R1 = Hn @ (eye - jnp.einsum("...i,...j->...ij", tstar1 / nu[..., None], n1))
    R2 = Hn @ (eye - jnp.einsum("...i,...j->...ij", tstar2 / nu[..., None], n2))
    T1 = 0.5 * jnp.einsum("...ij,...j->...i", R1, tstar1)
    T2 = 0.5 * jnp.einsum("...ij,...j->...i", R2, tstar2)

    pure_e = pure[..., None]
    pure_m = pure[..., None, None]
    zero3 = jnp.zeros_like(T1)
    return (
        jnp.where(pure_m, R_pure, R1),
        jnp.where(pure_m, R_pure, R2),
        jnp.where(pure_e, zero3, T1),
        jnp.where(pure_e, zero3, T2),
        jnp.where(pure_e, zero3, n1),
        jnp.where(pure_e, zero3, n2),
        pure,
    )
