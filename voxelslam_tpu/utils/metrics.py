"""Trajectory evaluation: ATE with SE(3) alignment (host-side numpy).

The reference validates by eye in RViz and external ATE tooling on
dumped alidarState.txt trajectories (SURVEY.md section 4); here ATE is a
first-class metric for tests and benchmarks.
"""

from __future__ import annotations

import numpy as np


def umeyama_se3(src: np.ndarray, dst: np.ndarray):
    """Best-fit rigid transform (R, t) minimizing ||R src + t - dst||."""
    mu_s = src.mean(0)
    mu_d = dst.mean(0)
    H = (src - mu_s).T @ (dst - mu_d)
    U, S, Vt = np.linalg.svd(H)
    d = np.sign(np.linalg.det(Vt.T @ U.T))
    D = np.diag([1.0, 1.0, d])
    R = Vt.T @ D @ U.T
    t = mu_d - R @ mu_s
    return R, t


def ate_rmse(est_p: np.ndarray, gt_p: np.ndarray, align: bool = True):
    """ATE RMSE between (N, 3) estimated and ground-truth positions."""
    est_p = np.asarray(est_p, np.float64)
    gt_p = np.asarray(gt_p, np.float64)
    if align:
        R, t = umeyama_se3(est_p, gt_p)
        est_p = est_p @ R.T + t
    err = est_p - gt_p
    return float(np.sqrt((err ** 2).sum(-1).mean()))
