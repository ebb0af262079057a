"""Sliding-window state as a fixed-shape struct-of-arrays pytree.

This replaces the reference's pointer-graph Map/Frame/Track store
(reference: xrslam/src/xrslam/map/{map,frame,track}.{h,cpp}) for the
solver's purposes: K frame slots (poses q,p + motion v,bg,ba) and L
landmark slots (inverse depth anchored at the first observation,
reference map/track.cpp:90-101), with validity masks instead of dynamic
containers. All shapes are static so every solve jit-compiles once per
(K, L) configuration.

Error-state order within a frame block is (θ, p, v, bg, ba) at offsets
(0, 3, 6, 9, 12) matching the reference (estimation/state.h:12-19).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..geometry import lie
from ..imu.preintegration import PreintDelta

ES_Q, ES_P, ES_V, ES_BG, ES_BA, ES_SIZE = 0, 3, 6, 9, 12, 15


class WindowState(NamedTuple):
    """Optimizable states. Leaves broadcast over leading batch dims."""

    q: jnp.ndarray         # (K,4) body(center)-to-world [w,x,y,z]
    p: jnp.ndarray         # (K,3)
    v: jnp.ndarray         # (K,3)
    bg: jnp.ndarray        # (K,3)
    ba: jnp.ndarray        # (K,3)
    inv_depth: jnp.ndarray  # (L,)

    @staticmethod
    def zeros(K: int, L: int, dtype=jnp.float64) -> "WindowState":
        return WindowState(
            q=lie.quat_identity((K,), dtype=dtype),
            p=jnp.zeros((K, 3), dtype=dtype),
            v=jnp.zeros((K, 3), dtype=dtype),
            bg=jnp.zeros((K, 3), dtype=dtype),
            ba=jnp.zeros((K, 3), dtype=dtype),
            inv_depth=jnp.zeros((L,), dtype=dtype),
        )

    @property
    def K(self) -> int:
        return self.q.shape[-2]

    @property
    def L(self) -> int:
        return self.inv_depth.shape[-1]


def retract(state: WindowState, dx: jnp.ndarray, dd: jnp.ndarray) -> WindowState:
    """Apply error-state increments: dx (K,15) on frames (q ⊞ δθ =
    q ⊗ exp(δθ), the reference's quaternion local parameterization,
    estimation/ceres/quaternion_parameterization.h:11-31), dd (L,) on
    inverse depths."""
    return WindowState(
        q=lie.quat_normalize(lie.quat_mul(state.q, lie.expmap(dx[..., ES_Q:ES_Q + 3]))),
        p=state.p + dx[..., ES_P:ES_P + 3],
        v=state.v + dx[..., ES_V:ES_V + 3],
        bg=state.bg + dx[..., ES_BG:ES_BG + 3],
        ba=state.ba + dx[..., ES_BA:ES_BA + 3],
        inv_depth=state.inv_depth + dd,
    )


def state_error(state: WindowState, lin: WindowState) -> jnp.ndarray:
    """Error-state of `state` relative to linearization point `lin`,
    (K,15) — the marginalization prior's ⊟ (reference
    ceres/marginalization_factor.h:35-45)."""
    dq = lie.logmap(lie.quat_mul(lie.quat_conj(lin.q), state.q))
    return jnp.concatenate(
        [dq, state.p - lin.p, state.v - lin.v, state.bg - lin.bg, state.ba - lin.ba],
        axis=-1,
    )


class MargPrior(NamedTuple):
    """Dense marginalization prior over the window frames (reference
    ceres/marginalization_factor.h): residual = sqrt_inv_cov ·
    (x ⊟ lin) + infovec, where x stacks all K frames' 15-dim error
    states. Frames beyond the valid prefix have zero rows/cols."""

    sqrt_inv_cov: jnp.ndarray  # (K*15, K*15)
    infovec: jnp.ndarray       # (K*15,)
    lin: WindowState           # linearization points (inv_depth unused)

    @staticmethod
    def zeros(K: int, L: int = 0, dtype=jnp.float64) -> "MargPrior":
        n = K * ES_SIZE
        return MargPrior(
            sqrt_inv_cov=jnp.zeros((n, n), dtype=dtype),
            infovec=jnp.zeros((n,), dtype=dtype),
            lin=WindowState.zeros(K, L, dtype=dtype),
        )

    @staticmethod
    def gauge_fix(K: int, L: int, lin: WindowState, weight: float = 1.0e8, dtype=jnp.float64) -> "MargPrior":
        """Initial prior: `weight` on frame 0's q and p (gauge fixing,
        reference estimation/marginalization_factor.h:31-32).

        The reference uses 1e15; we deliberately use 1e8. With weight w
        the prior residual amplifies f64 rounding noise of the frame-0
        error state (~1e-17, and XLA's fused reordering makes it
        nonzero even at the exact linearization point) to w·1e-17 — at
        w=1e15 that is a ~1e-4 cost-noise floor below which the LM
        accept/reject test can no longer see real improvements and the
        solver plateaus. 1e8 still exceeds any physical information in
        the window (~1e7) by orders of magnitude, so the gauge remains
        pinned, while the noise floor drops to ~1e-18."""
        n = K * ES_SIZE
        diag = jnp.zeros((n,), dtype=dtype).at[0:6].set(weight)
        return MargPrior(
            sqrt_inv_cov=jnp.diag(diag),
            infovec=jnp.zeros((n,), dtype=dtype),
            lin=lin,
        )


class WindowData(NamedTuple):
    """Per-solve constants: observations, extrinsics, preintegrations,
    masks, and the marginalization prior."""

    # Extrinsics (body-center → sensor), per frame.
    q_bc: jnp.ndarray      # (K,4) camera
    p_bc: jnp.ndarray      # (K,3)
    q_bi: jnp.ndarray      # (K,4) imu
    p_bi: jnp.ndarray      # (K,3)

    # Observations: unit bearing of landmark l observed in frame k
    # (camera frame), dense (K,L) grid with mask.
    bearings: jnp.ndarray  # (K,L,3)
    obs_mask: jnp.ndarray  # (K,L) bool
    ref_idx: jnp.ndarray   # (L,) int32 — first-observation (anchor) frame
    sqrt_inv_cov2: jnp.ndarray  # (K,2,2) keypoint noise weight

    # Preintegration: entry j connects frame j-1 → j (entry 0 unused).
    preint: PreintDelta    # leaves have leading (K,) dim
    preint_mask: jnp.ndarray  # (K,) bool
    bg_lin: jnp.ndarray    # (K,3) bias linearization of frame j-1 at integration
    ba_lin: jnp.ndarray    # (K,3)

    # Masks / fixed-state tags (reference FT_FIX_POSE / FT_FIX_MOTION /
    # TT_FIX_INVD and constant-block handling, solver.cpp:84-110).
    frame_mask: jnp.ndarray    # (K,) frame slot valid
    fix_pose: jnp.ndarray      # (K,)
    fix_motion: jnp.ndarray    # (K,)
    landmark_mask: jnp.ndarray  # (L,) landmark participates
    fix_landmark: jnp.ndarray   # (L,) inv_depth held constant

    marg: MargPrior
    use_marg: jnp.ndarray  # () bool

    @staticmethod
    def empty(K: int, L: int, dtype=jnp.float64) -> "WindowData":
        qi = lie.quat_identity((K,), dtype=dtype)
        z3 = jnp.zeros((K, 3), dtype=dtype)
        preint0 = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (K,) + x.shape), PreintDelta.identity(dtype=dtype)
        )
        return WindowData(
            q_bc=qi, p_bc=z3, q_bi=qi, p_bi=z3,
            bearings=jnp.zeros((K, L, 3), dtype=dtype),
            obs_mask=jnp.zeros((K, L), dtype=bool),
            ref_idx=jnp.zeros((L,), dtype=jnp.int32),
            sqrt_inv_cov2=jnp.broadcast_to(jnp.eye(2, dtype=dtype), (K, 2, 2)),
            preint=preint0,
            preint_mask=jnp.zeros((K,), dtype=bool),
            bg_lin=z3, ba_lin=z3,
            frame_mask=jnp.zeros((K,), dtype=bool),
            fix_pose=jnp.zeros((K,), dtype=bool),
            fix_motion=jnp.zeros((K,), dtype=bool),
            landmark_mask=jnp.zeros((L,), dtype=bool),
            fix_landmark=jnp.zeros((L,), dtype=bool),
            marg=MargPrior.zeros(K, 0, dtype=dtype),
            use_marg=jnp.asarray(False),
        )
