"""Trajectory evaluation: ATE RMSE with Horn alignment (+ optional scale).

Mirrors the reference's offline evaluation scripts
(reference: evaluation/evaluate_ate_scale.py — Horn alignment + ATE RMSE,
evaluation/associate.py — timestamp association), as pure NumPy utilities.
"""
from __future__ import annotations

import numpy as np


def associate(t_est: np.ndarray, t_gt: np.ndarray, max_dt: float = 0.02):
    """Greedy nearest-timestamp association. Returns (idx_est, idx_gt)."""
    ie, ig = [], []
    j = 0
    for i, te in enumerate(t_est):
        j = int(np.argmin(np.abs(t_gt - te)))
        if abs(t_gt[j] - te) <= max_dt:
            ie.append(i)
            ig.append(j)
    return np.asarray(ie, int), np.asarray(ig, int)


def align_horn(P: np.ndarray, Q: np.ndarray, with_scale: bool = False):
    """Find (s, R, t) minimizing ||Q - (s R P + t)||. P,Q: [N,3]."""
    mu_p = P.mean(0)
    mu_q = Q.mean(0)
    Pc = P - mu_p
    Qc = Q - mu_q
    S = Qc.T @ Pc
    U, D, Vt = np.linalg.svd(S)
    E = np.eye(3)
    E[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ E @ Vt
    s = (D * np.diag(E)).sum() / (Pc ** 2).sum() if with_scale else 1.0
    t = mu_q - s * R @ mu_p
    return s, R, t


def ate_rmse(traj_est: np.ndarray, traj_gt: np.ndarray,
             with_scale: bool = False) -> float:
    """Absolute trajectory error (RMSE of aligned positions). Inputs are
    [N,3] camera centers with rows already associated."""
    s, R, t = align_horn(traj_est, traj_gt, with_scale)
    aligned = (s * (R @ traj_est.T)).T + t
    err = np.linalg.norm(aligned - traj_gt, axis=1)
    return float(np.sqrt((err ** 2).mean()))


def centers_from_tcw(R_cw: np.ndarray, t_cw: np.ndarray) -> np.ndarray:
    """Camera centers C = -R^T t for stacked poses [N,3,3], [N,3]."""
    return -np.einsum('nji,nj->ni', R_cw, t_cw)
