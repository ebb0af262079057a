"""Trajectory evaluation: Umeyama alignment + ATE/RPE, and TUM-format
trajectory IO.

Built-in replacement for the external `evo` tool the reference's
evaluation workflow depends on (reference:
docs/en/tutorials/euroc_evaluation.md:21-41 — `evo_ape ... -va`), and
for the PC player's trajectory writers (reference:
xrslam-pc/player/src/trajectory_writer.h:30-75).
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(src: np.ndarray, dst: np.ndarray, with_scale: bool = False):
    """Least-squares similarity transform aligning src -> dst (both
    (N,3)). Returns (s, R, t) with dst ≈ s·R·src + t."""
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    if with_scale:
        var_s = (xs ** 2).sum() / len(src)
        s = float(np.trace(np.diag(D) @ S) / max(var_s, 1e-12))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def ate_rmse(est: np.ndarray, gt: np.ndarray, with_scale: bool = False) -> float:
    """Absolute trajectory error RMSE after SE3 (or Sim3) alignment —
    the evo_ape metric the reference benchmarks with."""
    s, R, t = umeyama_alignment(est, gt, with_scale)
    aligned = (s * (R @ est.T)).T + t
    return float(np.sqrt(np.mean(np.sum((aligned - gt) ** 2, axis=1))))


def rpe_rmse(est: np.ndarray, gt: np.ndarray, delta: int = 1) -> float:
    """Relative pose (translation) error RMSE over `delta`-frame steps."""
    d_est = est[delta:] - est[:-delta]
    d_gt = gt[delta:] - gt[:-delta]
    return float(np.sqrt(np.mean(np.sum((d_est - d_gt) ** 2, axis=1))))


def write_tum(path: str, ts, qs, ps):
    """TUM format: `t px py pz qx qy qz qw` (reference
    trajectory_writer.h TUMTrajectoryWriter::write)."""
    with open(path, "w") as f:
        for t, q, p in zip(ts, qs, ps):
            f.write(f"{t:.9f} {p[0]:.9f} {p[1]:.9f} {p[2]:.9f} "
                    f"{q[1]:.9f} {q[2]:.9f} {q[3]:.9f} {q[0]:.9f}\n")


def read_tum(path: str):
    """Returns (ts (N,), qs (N,4) [w,x,y,z], ps (N,3))."""
    ts, qs, ps = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            v = [float(x) for x in line.split()]
            ts.append(v[0])
            ps.append(v[1:4])
            qs.append([v[7], v[4], v[5], v[6]])
    return np.asarray(ts), np.asarray(qs), np.asarray(ps)


def associate(t_a: np.ndarray, t_b: np.ndarray, max_dt: float = 0.02):
    """Nearest-timestamp association of two trajectories. Returns index
    pairs (ia, ib)."""
    ia, ib = [], []
    j = 0
    for i, t in enumerate(t_a):
        while j + 1 < len(t_b) and abs(t_b[j + 1] - t) < abs(t_b[j] - t):
            j += 1
        if abs(t_b[j] - t) <= max_dt:
            ia.append(i)
            ib.append(j)
    return np.asarray(ia, dtype=int), np.asarray(ib, dtype=int)
