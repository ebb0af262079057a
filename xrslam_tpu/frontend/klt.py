"""Pyramidal Lucas-Kanade optical flow, batched over keypoints.

Replaces cv::calcOpticalFlowPyrLK as used by the reference
(reference: xrslam-extra/src/xrslam/extra/opencv_image.cpp:75-154):
21×21 window, 4 pyramid images (3 levels + base), ≤30 iterations,
eps 0.01, OPTFLOW_USE_INITIAL_FLOW (rotation-predicted seeds),
forward + backward pass with a 0.5 px reverse-consistency gate, 20 px
border rejection, and a rows/4 max-displacement gate.

TPU-native design: all keypoints advance in lockstep as one batched
computation per pyramid level (vmap over points, `lax.fori_loop` for
the iterations); convergence is handled with per-point masks, not
early exits. Sampling is bilinear (OpenCV's interpolation for LK).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import image as img_ops


def _bilinear(img: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H,W) at xy (...,2) float coords (x right, y down)
    with clamping; returns (...,)."""
    H, W = img.shape
    x = jnp.clip(xy[..., 0], 0.0, W - 1.001)
    y = jnp.clip(xy[..., 1], 0.0, H - 1.001)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    fx = x - x0
    fy = y - y0
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (
        v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx
        + v10 * fy * (1 - fx) + v11 * fy * fx
    )


def _track_level(
    prev_img, prev_ix, prev_iy, next_img, pts_prev, guess, valid,
    win: int, iters: int, eps: float, min_eig_floor: float = 1e-4,
    final: bool = False,
):
    """One pyramid level of iterative LK for all points.

    pts_prev, guess: (N,2) level coords. Returns (new_guess, valid).
    Matching cv::calcOpticalFlowPyrLK, ill-conditioned or out-of-window
    points only lose their status at the FINAL (level-0) pass; at upper
    levels they simply keep their incoming guess.
    """
    H, W = prev_img.shape
    r = win // 2
    offs = jnp.stack(
        jnp.meshgrid(
            jnp.arange(-r, r + 1, dtype=pts_prev.dtype),
            jnp.arange(-r, r + 1, dtype=pts_prev.dtype),
            indexing="xy",
        ),
        axis=-1,
    ).reshape(-1, 2)  # (win*win, 2) [x,y]

    def per_point(pt, g0, ok):
        grid_t = pt[None, :] + offs
        T = _bilinear(prev_img, grid_t)
        Ix = _bilinear(prev_ix, grid_t)
        Iy = _bilinear(prev_iy, grid_t)
        gxx = jnp.sum(Ix * Ix)
        gxy = jnp.sum(Ix * Iy)
        gyy = jnp.sum(Iy * Iy)
        det = gxx * gyy - gxy * gxy
        win_area = offs.shape[0]
        cond_ok = (gxx + gyy) > 0
        small_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy))
        cond_ok = cond_ok & (small_eig / win_area > min_eig_floor) & (det > 1e-12)
        inv_det = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 0, det, 1.0), 0.0)

        in_bounds0 = (
            (pt[0] >= r) & (pt[0] < W - r) & (pt[1] >= r) & (pt[1] < H - r)
        )

        def body(i, carry):
            g, conv = carry
            grid_n = g[None, :] + offs
            J = _bilinear(next_img, grid_n)
            diff = J - T
            bx = jnp.sum(diff * Ix)
            by = jnp.sum(diff * Iy)
            dx = -(gyy * bx - gxy * by) * inv_det
            dy = -(-gxy * bx + gxx * by) * inv_det
            d = jnp.stack([dx, dy])
            g_new = jnp.where(conv, g, g + d)
            conv = conv | (jnp.sum(d * d) < eps * eps)
            return g_new, conv

        g_fin, _ = jax.lax.fori_loop(0, iters, body, (g0, jnp.asarray(False)))
        good_here = cond_ok & in_bounds0
        g_fin = jnp.where(ok & good_here, g_fin, g0)
        ok_out = (ok & good_here) if final else ok
        return g_fin, ok_out

    return jax.vmap(per_point)(pts_prev, guess, valid)


def lk_flow(
    prev_pyr, next_pyr, pts_prev, pts_init, valid_in,
    win: int = 21, iters: int = 30, eps: float = 0.01,
):
    """Multi-level forward LK. pts are base-level pixel coords (N,2);
    `pts_init` seeds the flow (OPTFLOW_USE_INITIAL_FLOW)."""
    levels = len(prev_pyr)
    scale_top = float(2 ** (levels - 1))
    guess = pts_init / scale_top
    valid = valid_in
    for lev in range(levels - 1, -1, -1):
        s = float(2**lev)
        prev_img = prev_pyr[lev]
        ix, iy = img_ops.scharr(prev_img)
        guess, valid = _track_level(
            prev_img, ix, iy, next_pyr[lev], pts_prev / s, guess, valid,
            win=win, iters=iters, eps=eps, final=(lev == 0),
        )
        if lev > 0:
            guess = guess * 2.0
    return guess, valid


@partial(jax.jit, static_argnames=("win", "iters", "border"))
def track_keypoints(
    prev_pyr, next_pyr, pts_prev, pts_init, valid_in,
    win: int = 21, iters: int = 30, eps: float = 0.01,
    border: int = 20, reverse_thresh: float = 0.5,
):
    """Forward+backward pyramidal LK with the reference's gates
    (opencv_image.cpp:75-154):
      - forward track seeded with pts_init,
      - 20 px border rejection,
      - displacement > rows/4 rejection,
      - backward track seeded with the original points; reject if the
        round trip misses by > 0.5 px.

    Returns (pts_next (N,2), status (N,) bool).
    """
    H, W = prev_pyr[0].shape
    fwd, st = lk_flow(prev_pyr, next_pyr, pts_prev, pts_init, valid_in, win, iters, eps)

    inb = (
        (fwd[:, 0] >= border) & (fwd[:, 0] < W - border)
        & (fwd[:, 1] >= border) & (fwd[:, 1] < H - border)
    )
    disp = jnp.linalg.norm(fwd - pts_prev, axis=-1)
    st = st & inb & (disp <= H / 4.0)

    bwd, st_b = lk_flow(next_pyr, prev_pyr, fwd, pts_prev, st, win, iters, eps)
    round_trip = jnp.linalg.norm(bwd - pts_prev, axis=-1)
    st = st & st_b & (round_trip <= reverse_thresh)
    pts_next = jnp.where(st[:, None], fwd, pts_init)
    return pts_next, st
