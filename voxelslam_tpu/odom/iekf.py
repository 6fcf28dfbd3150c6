"""Iterated-EKF LiDAR-inertial odometry update.

Capability parity with the reference `lio_state_estimation`
(voxelslam.cpp:962-1098 in the reference tree): up to 4 iterations of
point-to-plane matching against the voxel map, a 6-DoF measurement block
folded into the 15-DoF prior with the Kalman form

    K1 = (H^T R^-1 H + P^-1)^-1
    dx = K1 H^T R^-1 z + (I - K1 H^T R^-1 H)(x_prop [-] x)

per-point noise R = 5e-4 + sigma_d from the match gate, posterior
covariance (I - G) P, and the divergence gate lambda_0(sum n n^T) >= 14
(voxelslam.cpp:1090-1097).

The reference's per-point octree walk with `inside()` caching becomes a
single batched `match_points` per iteration; re-matching every iteration
is free on TPU (it is one gather pass), strictly fresher than the
reference's cached-node shortcut.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..core import so3
from ..core.state import NavState, DIM
from ..core.eig3 import eigvalsh3
from ..map import voxel_map as vm
from ..ops import knn as knn_ops

ROT_CONV = 0.01 / 57.3    # rad (reference voxelslam.cpp:1069)
TRA_CONV = 0.015 / 100.0  # m


def point_var_body(pts: jnp.ndarray, dept_err: float, beam_err: float):
    """Per-point 3x3 covariance from range/bearing noise (reference
    calcBodyVar, voxelslam.hpp:180-200). pts: (N, 3) body frame."""
    r = jnp.linalg.norm(pts, axis=-1, keepdims=True)
    d = pts / jnp.maximum(r, 1e-6)
    # tangent basis
    a = jnp.where(jnp.abs(d[:, 2:3]) < 0.9,
                  jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], pts.dtype), d.shape),
                  jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], pts.dtype), d.shape))
    t1 = jnp.cross(d, a)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-9)
    t2 = jnp.cross(d, t1)
    sig_d = dept_err ** 2
    sig_t = (beam_err * r) ** 2  # (N, 1)
    var = (sig_d * d[:, :, None] * d[:, None, :]
           + sig_t[..., None] * (t1[:, :, None] * t1[:, None, :]
                                 + t2[:, :, None] * t2[:, None, :]))
    return var


def var_world(state: NavState, pts_local: jnp.ndarray, var_body: jnp.ndarray):
    """World-frame per-point covariance incl. pose uncertainty (reference
    pvec_update, voxelslam.hpp:242-265)."""
    rot_var = state.cov[0:3, 0:3]
    tsl_var = state.cov[3:6, 3:6]
    phat = so3.hat(pts_local)
    return (jnp.einsum("ij,njk,lk->nil", state.R, var_body, state.R)
            + phat @ rot_var @ jnp.swapaxes(phat, -1, -2)
            + tsl_var)


def _kalman_step(state: NavState, x_prop: NavState, cov_inv: jnp.ndarray,
                 HTH6: jnp.ndarray, HTz6: jnp.ndarray):
    """One iterated-EKF linear solve (reference voxelslam.cpp:1052-1060)."""
    H_T_H = jnp.zeros((DIM, DIM)).at[0:6, 0:6].set(HTH6)
    K1 = jnp.linalg.inv(H_T_H + cov_inv)
    G6 = K1[:, 0:6] @ HTH6          # (DIM, 6)
    vec = x_prop.boxminus(state)    # (DIM,)
    sol = K1[:, 0:6] @ HTz6 + vec - G6 @ vec[0:6]
    G = jnp.zeros((DIM, DIM)).at[:, 0:6].set(G6)
    return sol, G


def iekf_update(state: NavState, levels, map_cfg, pts_local: jnp.ndarray,
                var_body: jnp.ndarray, mask: jnp.ndarray,
                max_iter: int = 4, degrade_eig: float = 14.0):
    """Iterated-EKF update against the voxel map.

    Returns (state, ok, diag) where ok is the divergence gate and diag
    holds match statistics.

    The hash-probe (octree descent) runs exactly twice, at entry and at
    the halfway iteration — a static unrolled version of the
    reference's rematch schedule (per-point cached nodes + `inside()`
    short-circuit, re-find on first iteration and after convergence,
    voxelslam.cpp:988-1010). In between, gate re-evaluation is pure
    elementwise math on the cached plane records, and updates are
    masked after convergence latches `stop`.
    """
    x_prop = state
    cov_inv = jnp.linalg.inv(state.cov)
    phat = so3.hat(pts_local)
    N = pts_local.shape[0]

    def locate(st):
        wld = pts_local @ st.R.T + st.p
        return vm.match_locate(levels, map_cfg, wld, mask)

    def iter_math(st, rec, found):
        """One Kalman iteration's measurement math on cached records."""
        vw = var_world(st, pts_local, var_body)
        wld = pts_local @ st.R.T + st.p
        m = vm.match_eval(rec, found, wld, vw, mask)
        ok = m["valid"]
        w = ok.astype(wld.dtype) / (5e-4 + m["sigma"])
        nrm = m["normal"]
        jac_r = jnp.einsum("nij,jk,nk->ni", phat, st.R.T, nrm)  # phat R^T n
        jac = jnp.concatenate([jac_r, nrm], axis=-1)            # (N, 6)
        HTH6 = jnp.einsum("n,ni,nj->ij", w, jac, jac)
        HTz6 = -jnp.einsum("n,ni,n->i", w, jac, m["dist"])
        nnt_new = jnp.einsum("n,ni,nj->ij", ok.astype(wld.dtype), nrm, nrm)

        sol, G_new = _kalman_step(st, x_prop, cov_inv, HTH6, HTz6)
        converged = ((jnp.linalg.norm(sol[0:3]) < ROT_CONV)
                     & (jnp.linalg.norm(sol[3:6]) < TRA_CONV))
        return sol, G_new, nnt_new, jnp.sum(ok), converged

    # Fixed unrolled schedule — fully straight-line (no lax.cond /
    # lax.while dispatch, everything fuses): relocate (hash probe)
    # exactly twice, at entry and at the halfway iteration, matching
    # the reference's typical converge -> rematch -> converge
    # trajectory under its 4-iteration cap (voxelslam.cpp:988-1010);
    # state updates are masked once `stop` latches, so early
    # convergence freezes the estimate exactly like a loop exit.
    relocate_at = (max_iter + 1) // 2
    st = state
    stop = jnp.bool_(False)
    rematch = jnp.int32(0)
    rec = jnp.zeros((N, vm.SLAB), pts_local.dtype)
    found = jnp.zeros((N,), jnp.bool_)
    nnt = jnp.zeros((3, 3))
    G = jnp.zeros((DIM, DIM))
    nmatch = jnp.int32(0)
    iters = jnp.int32(0)
    for k in range(max_iter):
        if k == 0 or k == relocate_at:
            rec, found = locate(st)
        sol, G_new, nnt_new, nm_new, converged = iter_math(st, rec, found)
        live = ~stop
        st = st.boxplus(jnp.where(live, sol, jnp.zeros_like(sol)))
        G = jnp.where(live, G_new, G)
        nnt = jnp.where(live, nnt_new, nnt)
        nmatch = jnp.where(live, nm_new, nmatch)
        iters = iters + live.astype(jnp.int32)
        # rematch bookkeeping: a relocation "spends" one rematch credit;
        # stop after the post-relocation pass converges (or cap).
        bump = converged | ((rematch == 0) & (k == max_iter - 2))
        rematch = rematch + jnp.where(live & bump, 1, 0)
        stop = stop | (rematch >= 2)

    cov_new = (jnp.eye(DIM) - G) @ st.cov
    st = dataclasses.replace(st, cov=cov_new)

    evals = eigvalsh3(nnt)
    ok = evals[0] >= degrade_eig
    return st, ok, dict(nnt_eig=evals, matches=nmatch, iters=iters)


def iekf_update_kdtree(state: NavState, ref_cloud: jnp.ndarray,
                       ref_mask: jnp.ndarray, pts_local: jnp.ndarray,
                       mask: jnp.ndarray, max_iter: int = 4,
                       prior_deweight: float = 1000.0):
    """Init-phase iEKF against a point cloud with 5-NN plane fits —
    the kd-tree LIO (reference voxelslam.cpp:1102-1252) with brute-force
    NN on TPU. Plane refits happen on the re-find schedule of the
    reference (first iteration + after convergence)."""
    x_prop = state
    cov_inv = jnp.linalg.inv(state.cov) / prior_deweight
    phat = so3.hat(pts_local)

    def refit(st):
        wld = pts_local @ st.R.T + st.p
        pf = knn_ops.plane_fit_nn(wld, ref_cloud, ref_mask)
        return pf["valid"] & (mask > 0), pf["normal"], pf["d"]

    ok0, nrm0, d0 = refit(state)

    def body(c):
        it, st, ok, nrm, dpl, rematch, stop = c
        wld = pts_local @ st.R.T + st.p
        pd2 = jnp.einsum("ni,ni->n", nrm, wld) + dpl
        w = ok.astype(wld.dtype)
        jac_r = jnp.einsum("nij,jk,nk->ni", phat, st.R.T, nrm)
        jac = jnp.concatenate([jac_r, nrm], axis=-1)
        HTH6 = jnp.einsum("n,ni,nj->ij", w, jac, jac)
        HTz6 = -jnp.einsum("n,ni,n->i", w, jac, pd2)
        sol, G = _kalman_step(st, x_prop, cov_inv, HTH6, HTz6)
        st_new = st.boxplus(sol)
        converged = ((jnp.linalg.norm(sol[0:3]) < ROT_CONV)
                     & (jnp.linalg.norm(sol[3:6]) < TRA_CONV))
        do_refit = converged | (it == max_iter - 2)
        ok2, nrm2, d2 = refit(st_new)
        ok = jnp.where(do_refit, ok2, ok)
        nrm = jnp.where(do_refit, nrm2, nrm)
        dpl = jnp.where(do_refit, d2, dpl)
        rematch_new = rematch + jnp.where(converged, 1, 0)
        stop_new = (rematch_new >= 2) | (it == max_iter - 1)
        return it + 1, st_new, ok, nrm, dpl, rematch_new, stop_new

    c0 = (jnp.int32(0), state, ok0, nrm0, d0, jnp.int32(0), jnp.bool_(False))
    it, st, ok, nrm, dpl, rematch, stop = jax.lax.while_loop(
        lambda c: (~c[6]) & (c[0] < max_iter), body, c0)
    return st
