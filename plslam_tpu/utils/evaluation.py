"""Trajectory evaluation: ATE / RPE.

The reference evaluates accuracy offline with standard ATE/RPE tooling
against dataset ground truth (SURVEY.md §4); this module provides the
same metrics in-repo so every run can report them.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def umeyama_alignment(x: np.ndarray, y: np.ndarray, with_scale: bool = False
                      ) -> Tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform aligning x (N,3) onto y (N,3).

    Returns (R, t, s) with y ~ s R x + t. Standard Umeyama 1991.
    """
    mu_x = x.mean(0)
    mu_y = y.mean(0)
    xc, yc = x - mu_x, y - mu_y
    cov = yc.T @ xc / len(x)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    if with_scale:
        var_x = (xc ** 2).sum() / len(x)
        s = float(np.trace(np.diag(D) @ S) / var_x)
    else:
        s = 1.0
    t = mu_y - s * R @ mu_x
    return R, t, s


def ate_rmse(est: np.ndarray, gt: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE between (F,4,4) pose arrays (uses
    translation components; SE(3) alignment unless align=False)."""
    p_est = est[:, :3, 3]
    p_gt = gt[:, :3, 3]
    if align:
        R, t, _ = umeyama_alignment(p_est, p_gt)
        p_est = p_est @ R.T + t
    err = p_est - p_gt
    return float(np.sqrt((err ** 2).sum(-1).mean()))


def rpe(est: np.ndarray, gt: np.ndarray, delta: int = 1
        ) -> Tuple[float, float]:
    """Relative pose error over frame gaps of ``delta``.

    Returns (translational RMSE in m, rotational RMSE in rad).
    """
    ts, rs = [], []
    for i in range(len(est) - delta):
        d_est = np.linalg.inv(est[i]) @ est[i + delta]
        d_gt = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(d_gt) @ d_est
        ts.append(np.linalg.norm(e[:3, 3]))
        ang = np.arccos(np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1))
        rs.append(ang)
    return float(np.sqrt(np.mean(np.array(ts) ** 2))), \
        float(np.sqrt(np.mean(np.array(rs) ** 2)))
