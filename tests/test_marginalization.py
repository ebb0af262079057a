"""Marginalization-consistency tests (SURVEY.md §4 item 3): the
marginalized prior must make the reduced problem's optimum match the
full problem's optimum on the remaining variables."""

import jax
import jax.numpy as jnp
import numpy as np

from xrslam_tpu.estimation.marginalization import (
    landmark_world_points, marginalize_frame, slide_window,
)
from xrslam_tpu.estimation.solver import SolveOptions, solve_window
from xrslam_tpu.estimation.window import ES_SIZE, MargPrior, WindowState
from xrslam_tpu.geometry import lie
from xrslam_tpu.io.synthetic import circle_scene

from helpers import build_window, euler_consistent, perturb_state, state_errors


def _problem(K=5, L=48, stride=5):
    scene = euler_consistent(circle_scene(n_frames=K * stride + 1, n_landmarks=L - 4))
    q_bc = lie.expmap(jnp.array([-jnp.pi / 2, 0.0, 0.0], dtype=jnp.float64))
    p_bc = jnp.array([0.02, -0.01, 0.03], dtype=jnp.float64)
    return build_window(scene, list(range(0, K * stride, stride)), L=L, q_bc=q_bc, p_bc=p_bc)


def test_gauge_prior_behaves_like_fixed_pose():
    """The 1e15 gauge prior on frame 0 (reference
    estimation/marginalization_factor.h:31-32) pins frame 0's pose."""
    state_gt, data = _problem()
    K, L = state_gt.q.shape[0], state_gt.inv_depth.shape[0]
    prior = MargPrior.gauge_fix(K, L, state_gt)
    data = data._replace(marg=prior, use_marg=jnp.asarray(True))
    st0 = perturb_state(state_gt, jax.random.PRNGKey(0), skip_frames=(0,))
    st, info = solve_window(st0, data, SolveOptions(iterations=20))
    rot, pos, vel = state_errors(st, state_gt)
    assert rot < 1e-4 and pos < 1e-3, (rot, pos, float(info["cost"]))


def test_marginalize_then_solve_matches_full_solve():
    """Solve the full 5-frame problem; separately, marginalize frame 0
    and solve the reduced 4-frame problem from the same starting point.
    The remaining frames' optima must agree closely.

    Agreement is approximate, not exact, even in the linear regime: the
    reference's scheme (which we reproduce) folds ALL window
    observations of victim-observed tracks into the prior
    (ceres/marginalization_factor.h:233-379) and then keeps those
    tracks alive re-anchored (map/track.cpp Track::remove_keypoint), so
    their surviving reprojection factors re-enter later solves — that
    information is double-counted, biasing the reduced optimum slightly
    toward the linearization point. Moreover, the prior is the GN
    quadratic marginal at the pre-solve state, which matches the full
    nonlinear optimum only to second order along well-observed
    directions (and to first order along weakly-observable ones, e.g.
    velocity). Tolerances cover both effects at this test's 0.01-scale
    perturbation; the *algebraic* exactness of the marginalization is
    covered tightly by test_marginal_prior_matches_hand_schur."""
    state_gt, data = _problem()
    K, L = state_gt.q.shape[0], state_gt.inv_depth.shape[0]
    data = data._replace(
        marg=MargPrior.gauge_fix(K, L, state_gt), use_marg=jnp.asarray(True)
    )
    key = jax.random.PRNGKey(1)
    st0 = perturb_state(
        state_gt, key, pose_scale=0.01, rot_scale=0.005, vel_scale=0.01,
        bias_scale=0.001, invd_scale=0.01, skip_frames=(),
    )

    opts = SolveOptions(iterations=25)
    st_full, info_full = solve_window(st0, data, opts)

    # marginalize frame 0 at st0's linearization, slide, then solve
    prior = marginalize_frame(st0, data, victim=0)
    st_red, data_red = slide_window(st0, data, prior, victim=0)
    st_red_opt, info_red = solve_window(st_red, data_red, opts)

    # compare remaining frames (full slots 1..4 vs reduced slots 0..3)
    for k in range(K - 1):
        dth = lie.logmap(
            lie.quat_mul(lie.quat_conj(st_full.q[k + 1]), st_red_opt.q[k])
        )
        assert float(jnp.linalg.norm(dth)) < 1e-2, (k, dth)
        assert float(jnp.linalg.norm(st_full.p[k + 1] - st_red_opt.p[k])) < 2e-2, k
        assert float(jnp.linalg.norm(st_full.v[k + 1] - st_red_opt.v[k])) < 3e-2, k


def test_marginal_prior_matches_hand_schur():
    """The strong algebraic check: the prior's quadratic (UᵀU, Uᵀiv)
    must equal an independently hand-built dense Schur marginal of
    exactly the information the reference folds (existing prior +
    victim-adjacent preintegration + victim-track reprojections,
    ceres/marginalization_factor.h:105-434) — landmarks eliminated
    scalar-wise, then the victim's 15×15 block."""
    from xrslam_tpu.estimation import factors

    state_gt, data = _problem()
    K, L = state_gt.q.shape[0], state_gt.inv_depth.shape[0]
    data = data._replace(
        marg=MargPrior.gauge_fix(K, L, state_gt, weight=1e3),
        use_marg=jnp.asarray(True),
    )
    st0 = perturb_state(
        state_gt, jax.random.PRNGKey(1), pose_scale=0.01, rot_scale=0.005,
        vel_scale=0.01, bias_scale=0.001, invd_scale=0.01, skip_frames=(),
    )
    KM = K * ES_SIZE
    dt = jnp.float64

    H = jnp.zeros((KM, KM), dtype=dt)
    b = jnp.zeros((KM,), dtype=dt)
    rm, Jm, _ = factors.marg_residual_jac(st0, data)
    H = H + Jm.T @ Jm
    b = b + Jm.T @ rm
    # preintegration factor adjacent to victim 0: j=1 (connects 0→1)
    rp, Ji, Jj, mp = factors.preint_residual_jac(st0, data)
    sel = (jnp.zeros((K,), bool).at[1].set(True) & mp).astype(dt)
    rp = rp * sel[:, None]
    Ji = Ji * sel[:, None, None]
    Jj = Jj * sel[:, None, None]
    oh_j = jnp.eye(K, dtype=dt)
    oh_i = jax.nn.one_hot(jnp.maximum(jnp.arange(K) - 1, 0), K, dtype=dt)
    Hb = jnp.zeros((K, ES_SIZE, K, ES_SIZE), dtype=dt)
    bb = jnp.zeros((K, ES_SIZE), dtype=dt)
    for Ja, oha in ((Ji, oh_i), (Jj, oh_j)):
        bb = bb + jnp.einsum("nra,nr,nk->ka", Ja, rp, oha)
        for Jb, ohb in ((Ji, oh_i), (Jj, oh_j)):
            Hb = Hb + jnp.einsum("nra,nrb,nk,nm->kamb", Ja, Jb, oha, ohb)
    H = H + Hb.reshape(KM, KM)
    b = b + bb.reshape(-1)
    # reprojection factors of victim-observed tracks, landmark dims explicit
    r, Jt, Jr6, Jd, m = factors.reproj_residual_jac(st0, data)
    lm_sel = data.obs_mask[0] & data.landmark_mask
    mf = (m & lm_sel[None, :]).astype(dt)
    r_n = np.asarray(r * mf[..., None])
    Jt_n = np.asarray(Jt * mf[..., None, None])
    Jr_n = np.asarray(Jr6 * mf[..., None, None])
    Jd_n = np.asarray(Jd * mf[..., None])
    ref_n = np.asarray(data.ref_idx)
    Jbig = np.zeros((K * L * 2, KM + L))
    rbig = r_n.reshape(-1)
    row = 0
    for k in range(K):
        for l in range(L):
            ft, fr = k * ES_SIZE, ref_n[l] * ES_SIZE
            Jbig[row:row + 2, ft:ft + 6] += Jt_n[k, l]
            Jbig[row:row + 2, fr:fr + 6] += Jr_n[k, l]
            Jbig[row:row + 2, KM + l] += Jd_n[k, l]
            row += 2
    Hfull = Jbig.T @ Jbig
    bfull = Jbig.T @ rbig
    Hfull[:KM, :KM] += np.asarray(H)
    bfull[:KM] += np.asarray(b)
    # scalar landmark elimination
    dl = np.diag(Hfull[KM:, KM:]).copy()
    act = dl > 1e-12
    inv_dl = np.where(act, 1.0 / np.where(act, dl, 1.0), 0.0)
    Hfl = Hfull[:KM, KM:]
    Hm = Hfull[:KM, :KM] - (Hfl * inv_dl[None, :]) @ Hfl.T
    bm = bfull[:KM] - (Hfl * inv_dl[None, :]) @ bfull[KM:]
    # victim frame-block elimination
    Hvv = Hm[:ES_SIZE, :ES_SIZE]
    Hred = Hm[ES_SIZE:, ES_SIZE:] - Hm[ES_SIZE:, :ES_SIZE] @ np.linalg.solve(Hvv, Hm[:ES_SIZE, ES_SIZE:])
    bred = bm[ES_SIZE:] - Hm[ES_SIZE:, :ES_SIZE] @ np.linalg.solve(Hvv, bm[:ES_SIZE])

    prior = marginalize_frame(st0, data, victim=0)
    U = np.asarray(prior.sqrt_inv_cov)
    iv = np.asarray(prior.infovec)
    n = (K - 1) * ES_SIZE
    Hp = (U.T @ U)[:n, :n]
    gp = (U.T @ iv)[:n]
    np.testing.assert_allclose(Hp, Hred, atol=1e-6 * max(1.0, np.abs(Hred).max()))
    np.testing.assert_allclose(gp, bred, atol=1e-8 * max(1.0, np.abs(bred).max()))


def test_marginalization_prior_information_is_psd():
    state_gt, data = _problem()
    K, L = state_gt.q.shape[0], state_gt.inv_depth.shape[0]
    data = data._replace(
        marg=MargPrior.gauge_fix(K, L, state_gt), use_marg=jnp.asarray(True)
    )
    prior = marginalize_frame(state_gt, data, victim=0)
    U = np.asarray(prior.sqrt_inv_cov)
    H = U.T @ U
    evals = np.linalg.eigvalsh(H)
    assert evals.min() > -1e-6
    # victim slot (last block) carries no information
    lastblock = H[(K - 1) * ES_SIZE:, :]
    np.testing.assert_allclose(lastblock, 0.0, atol=1e-9)
    # infovec ~ 0 at the linearization point of an exactly-converged
    # problem isn't required (gauge prior at GT has zero residual here)
    assert np.isfinite(np.asarray(prior.infovec)).all()


def test_slide_window_reanchors_landmarks():
    state_gt, data = _problem()
    x_w_before = landmark_world_points(state_gt, data)
    prior = marginalize_frame(state_gt, data, victim=0)
    st2, data2 = slide_window(state_gt, data, prior, victim=0)
    x_w_after = landmark_world_points(st2, data2)
    m = np.asarray(data2.landmark_mask)
    np.testing.assert_allclose(
        np.asarray(x_w_after)[m], np.asarray(x_w_before)[m], atol=1e-9
    )
    # anchors are valid observing frames in the new layout
    ref = np.asarray(data2.ref_idx)[m]
    obs = np.asarray(data2.obs_mask)
    assert all(obs[ref[i], np.nonzero(m)[0][i]] for i in range(m.sum()))
