"""2-point rotation solve (Wahba problem), batched.

reference: xrslam/src/xrslam/geometry/wahba.h:9-27 — SVD of the bearing
covariance with determinant-sign correction; convention p2 = R · p1.
"""

from __future__ import annotations

import jax.numpy as jnp


def solve_rotation(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """p1, p2: (...,N,3) unit bearings -> R (...,3,3) with p2 ≈ R p1."""
    cov = 0.5 * jnp.einsum("...ni,...nj->...ij", p1, p2)
    U, _, Vt = jnp.linalg.svd(cov)
    V = jnp.swapaxes(Vt, -1, -2)
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    D = jnp.zeros_like(cov).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(jnp.sign(det))
    return V @ D @ jnp.swapaxes(U, -1, -2)


def rotation_angular_error(R: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Angular residual acos((R p1)·p2) (reference stereo.cpp:77-83)."""
    rp = jnp.einsum("...ij,...nj->...ni", R, p1)
    return jnp.arccos(jnp.clip(jnp.sum(rp * p2, axis=-1), -1.0, 1.0))
