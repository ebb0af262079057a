"""Pallas TPU kernel for one pyramidal-LK level.

The XLA path (klt.py) costs one (N·22·22) block-gather per LK iteration
per level — ~240 sequential gather rounds per frame. This kernel
instead runs the whole 30-iteration refinement in VMEM: per keypoint it
DMAs the template/gradient windows and ONE search block around the
initial guess from HBM, then iterates with dynamic-start slices inside
VMEM (the bilinear blend shares a single fractional offset across the
window, so sampling is four shifted slices — no gathers anywhere).

Semantics match klt._track_level with one documented difference: the
iterate is confined to a ±SEARCH/2 search block around its initial
guess. Points that would drift further are exactly the ones the
displacement/reverse-consistency gates (klt.track_keypoints,
reference opencv_image.cpp:117-141) reject anyway.

NOT the default TPU path: the hat-selector MXU formulation
(klt._track_level_mxu) won the on-chip A/B and klt.lk_flow selects it;
set XR_LK_BACKEND=pallas to run this kernel instead
(tools/ab_lk_backend.py records the comparison).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SEARCH = 64  # search block side; iterate confined to it


def _blend(blk, fx, fy, win):
    """Bilinear blend of a (win+1, win+1) block → (win, win)."""
    return ((1 - fy) * (1 - fx) * blk[:win, :win]
            + (1 - fy) * fx * blk[:win, 1:win + 1]
            + fy * (1 - fx) * blk[1:win + 1, :win]
            + fy * fx * blk[1:win + 1, 1:win + 1])


def _kernel(pts_ref, guess_ref, valid_ref,     # SMEM scalars
            prev_ref, pix_ref, piy_ref, next_ref,   # HBM images
            gout_ref, okout_ref,               # outputs
            t_s, ix_s, iy_s, j_s, sem,         # scratch
            *, win, iters, eps, min_eig_floor, final, H, W):
    i = pl.program_id(0)
    r = win // 2
    blk = win + 1

    px = pts_ref[i, 0]
    py = pts_ref[i, 1]
    gx0 = guess_ref[i, 0]
    gy0 = guess_ref[i, 1]
    ok_in = valid_ref[i] > 0

    # template/gradient windows at the (fixed) previous-frame point
    tx0 = jnp.clip(jnp.floor(px - r).astype(jnp.int32), 0, W - blk)
    ty0 = jnp.clip(jnp.floor(py - r).astype(jnp.int32), 0, H - blk)
    fx_t = px - r - tx0.astype(px.dtype)
    fy_t = py - r - ty0.astype(py.dtype)

    # search block around the initial guess
    jx0 = jnp.clip(jnp.floor(gx0).astype(jnp.int32) - SEARCH // 2, 0, W - SEARCH)
    jy0 = jnp.clip(jnp.floor(gy0).astype(jnp.int32) - SEARCH // 2, 0, H - SEARCH)

    cp_t = pltpu.make_async_copy(
        prev_ref.at[pl.ds(ty0, blk), pl.ds(tx0, blk)], t_s, sem.at[0])
    cp_x = pltpu.make_async_copy(
        pix_ref.at[pl.ds(ty0, blk), pl.ds(tx0, blk)], ix_s, sem.at[1])
    cp_y = pltpu.make_async_copy(
        piy_ref.at[pl.ds(ty0, blk), pl.ds(tx0, blk)], iy_s, sem.at[2])
    cp_j = pltpu.make_async_copy(
        next_ref.at[pl.ds(jy0, SEARCH), pl.ds(jx0, SEARCH)], j_s, sem.at[3])
    cp_t.start()
    cp_x.start()
    cp_y.start()
    cp_j.start()
    cp_t.wait()
    cp_x.wait()
    cp_y.wait()
    cp_j.wait()

    T = _blend(t_s[:, :], fx_t, fy_t, win)
    Ix = _blend(ix_s[:, :], fx_t, fy_t, win)
    Iy = _blend(iy_s[:, :], fx_t, fy_t, win)

    gxx = jnp.sum(Ix * Ix)
    gxy = jnp.sum(Ix * Iy)
    gyy = jnp.sum(Iy * Iy)
    det = gxx * gyy - gxy * gxy
    small_eig = 0.5 * (gxx + gyy - jnp.sqrt((gxx - gyy) ** 2 + 4 * gxy * gxy))
    cond_ok = ((gxx + gyy) > 0) & (small_eig / (win * win) > min_eig_floor) \
        & (det > 1e-12)
    inv_det = jnp.where(det > 1e-12, 1.0 / jnp.where(det > 0, det, 1.0), 0.0)
    in_bounds0 = (px >= r) & (px < W - r) & (py >= r) & (py < H - r)

    jx0f = jx0.astype(px.dtype)
    jy0f = jy0.astype(py.dtype)
    # local coords of the iterate inside the search block
    lx0 = gx0 - jx0f
    ly0 = gy0 - jy0f
    lmin = jnp.asarray(0.0, px.dtype)
    lmax = jnp.asarray(float(SEARCH - win - 1), px.dtype)

    dt = px.dtype
    # iota must be integer-typed on TPU; cast after
    tap_ids = jax.lax.broadcasted_iota(jnp.int32, (win, SEARCH), 0).astype(dt)
    grid_ids = jax.lax.broadcasted_iota(jnp.int32, (win, SEARCH), 1).astype(dt)

    def hat_sel(start):
        """(win, SEARCH) linear-interpolation selector: row r weights
        hat(grid − (start + r)). Sampling the window becomes
        R·S·Cᵀ — two small MXU matmuls with NO dynamic slicing (Mosaic
        requires dynamic lane-dim offsets to be 128-multiples, which
        the iterate's sub-pixel position is not)."""
        return jnp.maximum(0.0, 1.0 - jnp.abs(grid_ids - (start + tap_ids)))

    def body(_, carry):
        lx, ly, conv = carry
        cx = jnp.clip(lx - r, lmin, lmax)
        cy = jnp.clip(ly - r, lmin, lmax)
        R = hat_sel(cy)
        C = hat_sel(cx)
        Jw = jnp.dot(jnp.dot(R, j_s[:, :], preferred_element_type=dt),
                     C.T, preferred_element_type=dt)
        diff = Jw - T
        bx = jnp.sum(diff * Ix)
        by = jnp.sum(diff * Iy)
        dx = -(gyy * bx - gxy * by) * inv_det
        dy = -(-gxy * bx + gxx * by) * inv_det
        lx_n = jnp.where(conv, lx, lx + dx)
        ly_n = jnp.where(conv, ly, ly + dy)
        conv = conv | ((dx * dx + dy * dy) < eps * eps)
        return lx_n, ly_n, conv

    lx, ly, _ = jax.lax.fori_loop(
        0, iters, body, (lx0, ly0, jnp.asarray(False)))

    good = cond_ok & in_bounds0
    use = ok_in & good
    gout_ref[i, 0] = jnp.where(use, lx + jx0f, gx0)
    gout_ref[i, 1] = jnp.where(use, ly + jy0f, gy0)
    okout_ref[i, 0] = jnp.where(use if final else ok_in, 1, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("win", "iters", "eps",
                                             "min_eig_floor", "final"))
def track_level_pallas(prev_img, prev_ix, prev_iy, next_img,
                       pts_prev, guess, valid,
                       win: int = 21, iters: int = 30, eps: float = 0.01,
                       min_eig_floor: float = 1e-4, final: bool = False):
    """Drop-in for klt._track_level on TPU. Returns (guess, valid)."""
    H, W = prev_img.shape
    N = pts_prev.shape[0]
    blk = win + 1
    dtype = prev_img.dtype

    kern = functools.partial(
        _kernel, win=win, iters=iters, eps=eps,
        min_eig_floor=min_eig_floor, final=final, H=H, W=W)

    g_out, ok_out = pl.pallas_call(
        kern,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # pts
            pl.BlockSpec(memory_space=pltpu.SMEM),   # guess
            pl.BlockSpec(memory_space=pltpu.SMEM),   # valid
            pl.BlockSpec(memory_space=pltpu.ANY),    # prev
            pl.BlockSpec(memory_space=pltpu.ANY),    # prev_ix
            pl.BlockSpec(memory_space=pltpu.ANY),    # prev_iy
            pl.BlockSpec(memory_space=pltpu.ANY),    # next
        ],
        out_specs=[
            # unblocked SMEM outputs: every program sees the full (N,2)/
            # (N,1) array and writes only its own row i (blocked (1,2)
            # specs violate the (8,128) tiling constraint when lowered)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N, 2), dtype),
            jax.ShapeDtypeStruct((N, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((blk, blk), dtype),
            pltpu.VMEM((blk, blk), dtype),
            pltpu.VMEM((blk, blk), dtype),
            pltpu.VMEM((SEARCH, SEARCH), dtype),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )(pts_prev.astype(dtype), guess.astype(dtype),
      valid.astype(jnp.int32), prev_img, prev_ix, prev_iy, next_img)
    return g_out, (ok_out[:, 0] > 0) if final else valid
