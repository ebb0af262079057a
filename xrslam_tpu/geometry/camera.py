"""Pinhole camera model, batched.

reference: xrslam/src/xrslam/geometry/stereo.h:8-25 (apply_k / remove_k /
dproj_dp) and xrslam-extra/src/xrslam/extra/opencv_image.cpp:163-177
(radial-tangential undistortion).
"""

from __future__ import annotations

import jax.numpy as jnp


def apply_k(p: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Project camera-frame points (...,3) to pixels (...,2) with intrinsics K (3,3)."""
    z = p[..., 2]
    return jnp.stack(
        [
            p[..., 0] / z * K[..., 0, 0] + K[..., 0, 2],
            p[..., 1] / z * K[..., 1, 1] + K[..., 1, 2],
        ],
        axis=-1,
    )


def remove_k(p: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Pixels (...,2) -> unit bearing vectors (...,3)."""
    v = jnp.stack(
        [
            (p[..., 0] - K[..., 0, 2]) / K[..., 0, 0],
            (p[..., 1] - K[..., 1, 2]) / K[..., 1, 1],
            jnp.ones_like(p[..., 0]),
        ],
        axis=-1,
    )
    return v / jnp.linalg.norm(v, axis=-1, keepdims=True)


def dproj_dp(p: jnp.ndarray) -> jnp.ndarray:
    """Jacobian of perspective division h(p)=(x/z, y/z): (...,3) -> (...,2,3)."""
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    iz = 1.0 / z
    iz2 = iz * iz
    zero = jnp.zeros_like(z)
    return jnp.stack(
        [
            jnp.stack([iz, zero, -x * iz2], axis=-1),
            jnp.stack([zero, iz, -y * iz2], axis=-1),
        ],
        axis=-2,
    )


def distort_radtan(p_norm: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Apply radial-tangential (OpenCV k1,k2,p1,p2[,k3]) distortion to
    normalized image coordinates (...,2)."""
    k1, k2, p1, p2 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
    k3 = dist[..., 4] if dist.shape[-1] > 4 else jnp.zeros_like(k1)
    x, y = p_norm[..., 0], p_norm[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort_radtan(p_dist: jnp.ndarray, dist: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Invert radial-tangential distortion by fixed-point iteration
    (matching cv::undistortPoints' iterative scheme; fixed iteration
    count keeps it jit-friendly)."""
    x0 = p_dist
    p = p_dist
    for _ in range(iters):
        k1, k2, p1, p2 = dist[..., 0], dist[..., 1], dist[..., 2], dist[..., 3]
        k3 = dist[..., 4] if dist.shape[-1] > 4 else jnp.zeros_like(k1)
        x, y = p[..., 0], p[..., 1]
        r2 = x * x + y * y
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        p = jnp.stack([(x0[..., 0] - dx) / radial, (x0[..., 1] - dy) / radial], axis=-1)
    return p


def undistort_pixels(uv: jnp.ndarray, K: jnp.ndarray, dist: jnp.ndarray) -> jnp.ndarray:
    """Distorted pixels -> undistorted pixels under the same K."""
    xn = jnp.stack(
        [(uv[..., 0] - K[..., 0, 2]) / K[..., 0, 0], (uv[..., 1] - K[..., 1, 2]) / K[..., 1, 1]],
        axis=-1,
    )
    xu = undistort_radtan(xn, dist)
    return jnp.stack(
        [xu[..., 0] * K[..., 0, 0] + K[..., 0, 2], xu[..., 1] * K[..., 1, 1] + K[..., 1, 2]],
        axis=-1,
    )
