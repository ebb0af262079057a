"""Device-side batched triangulation vs the host multi-view DLT
(window_builder.triangulate_track ≙ reference map/track.cpp:46-76)."""

import jax.numpy as jnp
import numpy as np

from xrslam_tpu.core import nputil
from xrslam_tpu.estimation.triangulate import triangulate_landmarks
from xrslam_tpu.estimation.window import WindowData, WindowState
from xrslam_tpu.io.synthetic import wave_scene


def _window_from_scene(n_frames=6, n_lm=24, seed=0, drop=()):
    """Build a minimal (state, data) pair + ground-truth ranges from a
    synthetic scene (identity extrinsics: camera = body)."""
    rng = np.random.default_rng(seed)
    sc = wave_scene(n_frames=n_frames, n_landmarks=n_lm, seed=seed)
    q = np.asarray(sc.q)[:n_frames]
    p = np.asarray(sc.p)[:n_frames]
    X = np.asarray(sc.landmarks)[:n_lm]
    K, L = n_frames, n_lm

    bearings = np.zeros((K, L, 3))
    bearings[..., 2] = 1.0
    obs = np.zeros((K, L), dtype=bool)
    for i in range(K):
        R = nputil.quat_to_matrix(q[i])
        x_c = (X - p[i]) @ R  # world -> camera (R^T (X - p))
        ok = x_c[:, 2] > 0.1
        b = x_c / np.linalg.norm(x_c, axis=1, keepdims=True)
        bearings[i, ok] = b[ok]
        obs[i, ok] = True
    for (i, l) in drop:
        obs[i, l] = False

    ref = np.where(obs.any(axis=0), obs.argmax(axis=0), 0).astype(np.int32)
    state = WindowState(
        q=jnp.asarray(q), p=jnp.asarray(p),
        v=jnp.zeros((K, 3)), bg=jnp.zeros((K, 3)), ba=jnp.zeros((K, 3)),
        inv_depth=jnp.zeros((L,)))
    qbc = np.zeros((K, 4))
    qbc[:, 0] = 1.0
    data = dict(
        q_bc=jnp.asarray(qbc), p_bc=jnp.zeros((K, 3)),
        bearings=jnp.asarray(bearings), obs_mask=jnp.asarray(obs),
        ref_idx=jnp.asarray(ref), frame_mask=jnp.ones((K,), dtype=bool))

    class D:  # minimal WindowData stand-in (only the used fields)
        pass

    d = D()
    for k, v in data.items():
        setattr(d, k, v)
    # gt anchor ranges
    p_a = p[ref]
    rng_gt = np.linalg.norm(X - p_a, axis=1)
    return state, d, rng_gt, obs


def test_matches_ground_truth():
    state, data, rng_gt, obs = _window_from_scene()
    cand = jnp.ones((len(rng_gt),), dtype=bool)
    invd, ok = triangulate_landmarks(state, data, cand)
    ok = np.asarray(ok)
    invd = np.asarray(invd)
    vis = obs.sum(axis=0) >= 2
    assert ok[vis].all(), np.nonzero(~ok & vis)
    np.testing.assert_allclose(invd[ok], 1.0 / rng_gt[ok], rtol=1e-6)


def test_gates():
    state, data, rng_gt, obs = _window_from_scene()
    L = len(rng_gt)
    # single-observation landmark must be rejected (n_obs < 2)
    obs1 = np.asarray(data.obs_mask).copy()
    keep = np.nonzero(obs1[:, 0])[0]
    obs1[keep[1:], 0] = False
    data.obs_mask = jnp.asarray(obs1)
    invd, ok = triangulate_landmarks(state, data, jnp.ones((L,), bool))
    assert not bool(ok[0])
    # non-candidates never pass
    invd, ok = triangulate_landmarks(state, data, jnp.zeros((L,), bool))
    assert not np.asarray(ok).any()


def test_cheirality_rejects_behind_camera():
    state, data, rng_gt, obs = _window_from_scene()
    L = len(rng_gt)
    # flip one landmark's bearings (point behind every camera)
    b = np.asarray(data.bearings).copy()
    b[:, 3, :] = -b[:, 3, :]
    data.bearings = jnp.asarray(b)
    invd, ok = triangulate_landmarks(state, data, jnp.ones((L,), bool))
    assert not bool(ok[3])
