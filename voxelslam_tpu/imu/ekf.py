"""EKF forward propagation + per-point motion compensation (de-skew).

Capability parity with the reference `IMUEKF` (ekf_imu.hpp:8-216 in the
reference tree): propagate the 15-state mean and covariance through the
scan's IMU samples, cache per-interval poses, then de-skew every LiDAR
point to the scan-end frame through the LiDAR->IMU extrinsic.

TPU-first: propagation is one `lax.scan` over padded/masked IMU pairs;
de-skew is a batched searchsorted + gather + SE(3) transform over all
points at once (the reference walks points in reverse per IMU segment,
ekf_imu.hpp:138-163).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import so3
from ..core.state import NavState, DIM


@partial(jax.tree_util.register_dataclass,
         data_fields=["offt", "R", "p", "v", "w", "a"], meta_fields=[])
@dataclasses.dataclass
class ImuPoses:
    """Per-IMU-interval poses cached for de-skew (reference imu_poses)."""
    offt: jnp.ndarray  # (M,) time offsets from scan begin (interval starts)
    R: jnp.ndarray     # (M, 3, 3)
    p: jnp.ndarray     # (M, 3)
    v: jnp.ndarray     # (M, 3)
    w: jnp.ndarray     # (M, 3) bias-corrected body rate on the interval
    a: jnp.ndarray     # (M, 3) world acceleration (gravity-compensated)


def propagate_sequential(state: NavState, imu_ts: jnp.ndarray,
                         gyr: jnp.ndarray, acc: jnp.ndarray,
                         mask: jnp.ndarray, scan_beg, scan_end,
                         last_end, cov_gyr: jnp.ndarray,
                         cov_acc: jnp.ndarray, cov_bg: jnp.ndarray,
                         cov_ba: jnp.ndarray, scale_gravity: float = 1.0):
    """Forward-propagate mean + covariance through one scan's IMU batch.

    imu_ts/gyr/acc: (N, ...) padded samples covering [last_end, scan_end];
    mask marks valid samples. Returns (state_at_scan_end, ImuPoses).
    Mirrors IMUEKF::motion_blur's propagation half (ekf_imu.hpp:41-133).

    Sequential `lax.scan` formulation — kept as the ground truth for
    `propagate` (the log-depth associative form used in production; a
    64-step sequential scan of tiny ops is dispatch-bound on TPU).
    """
    dtype = gyr.dtype
    f32 = lambda x: jnp.asarray(x, dtype)
    scan_beg, scan_end, last_end = f32(scan_beg), f32(scan_end), f32(last_end)

    heads_t = jnp.maximum(imu_ts[:-1], last_end)
    tails_t = imu_ts[1:]
    pair_valid = (mask[:-1] > 0) & (mask[1:] > 0) & (tails_t >= last_end)
    dt = jnp.where(pair_valid, tails_t - heads_t, 0.0)
    w_mid = 0.5 * (gyr[:-1] + gyr[1:]) - state.bg
    a_mid = 0.5 * (acc[:-1] + acc[1:]) * scale_gravity - state.ba

    I3 = jnp.eye(3, dtype=dtype)

    def step(carry, inp):
        R, p, v, cov, w_last, a_last = carry
        dt_i, w_i, a_i, valid, head_t = inp
        a_world = R @ a_i + state.g

        # record pose at interval start (before the update)
        rec = (jnp.where(valid, head_t - scan_beg, jnp.inf), R, p, v, w_i, a_world)

        a_hat = so3.hat(a_i)
        F = jnp.eye(DIM, dtype=dtype)
        F = F.at[0:3, 0:3].set(so3.exp(-w_i * dt_i))
        F = F.at[0:3, 9:12].set(-I3 * dt_i)
        F = F.at[3:6, 6:9].set(I3 * dt_i)
        F = F.at[6:9, 0:3].set(-R @ a_hat * dt_i)
        F = F.at[6:9, 12:15].set(-R * dt_i)
        Q = jnp.zeros((DIM, DIM), dtype=dtype)
        Q = Q.at[0:3, 0:3].set(jnp.diag(cov_gyr) * dt_i * dt_i)
        Q = Q.at[6:9, 6:9].set(R @ jnp.diag(cov_acc) @ R.T * dt_i * dt_i)
        Q = Q.at[9:12, 9:12].set(jnp.diag(cov_bg) * dt_i * dt_i)
        Q = Q.at[12:15, 12:15].set(jnp.diag(cov_ba) * dt_i * dt_i)
        cov_n = F @ cov @ F.T + Q

        p_n = p + v * dt_i + 0.5 * a_world * dt_i * dt_i
        v_n = v + a_world * dt_i
        R_n = R @ so3.exp(w_i * dt_i)

        def keep(x, y):
            return jnp.where(valid, x, y)

        carry_n = (keep(R_n, R), keep(p_n, p), keep(v_n, v), keep(cov_n, cov),
                   keep(w_i, w_last), keep(a_world, a_last))
        return carry_n, rec

    init = (state.R, state.p, state.v, state.cov,
            jnp.zeros(3, dtype), jnp.zeros(3, dtype))
    (R, p, v, cov, w_last, a_last), recs = jax.lax.scan(
        step, init, (dt, w_mid, a_mid, pair_valid, heads_t))

    poses = ImuPoses(offt=recs[0], R=recs[1], p=recs[2], v=recs[3],
                     w=recs[4], a=recs[5])

    # extrapolate from the last valid IMU time to the scan end
    # (reference ekf_imu.hpp:117-123, signed dt)
    imu_end = jnp.max(jnp.where(mask > 0, imu_ts, -jnp.inf))
    dte = scan_end - imu_end
    new_state = dataclasses.replace(
        state,
        v=v + a_last * dte,
        R=R @ so3.exp(w_last * dte),
        p=p + v * dte + 0.5 * a_last * dte * dte,
        t=scan_end,
        cov=cov,
    )
    return new_state, poses


def propagate(state: NavState, imu_ts: jnp.ndarray, gyr: jnp.ndarray,
              acc: jnp.ndarray, mask: jnp.ndarray, scan_beg, scan_end,
              last_end, cov_gyr: jnp.ndarray, cov_acc: jnp.ndarray,
              cov_bg: jnp.ndarray, cov_ba: jnp.ndarray,
              scale_gravity: float = 1.0):
    """Log-depth EKF propagation (same results as
    `propagate_sequential`, which see for the reference mapping).

    The per-interval recurrences are restructured for the TPU:

      R_k = R_0 E_1 ... E_k            -> associative_scan of 3x3 products
      v_k, p_k                         -> cumsums given the R prefix
      cov_k = F_k cov F_k^T + Q_k      -> associative_scan over the affine
                                          pairs (A,B) with composition
                                          (A2 A1, A2 B1 A2^T + B2)

    so a 64-sample scan costs ~log2(64) fused steps instead of 64
    sequential dispatches.
    """
    dtype = gyr.dtype
    f32 = lambda x: jnp.asarray(x, dtype)
    scan_beg, scan_end, last_end = f32(scan_beg), f32(scan_end), f32(last_end)

    heads_t = jnp.maximum(imu_ts[:-1], last_end)
    tails_t = imu_ts[1:]
    pair_valid = (mask[:-1] > 0) & (mask[1:] > 0) & (tails_t >= last_end)
    dt = jnp.where(pair_valid, tails_t - heads_t, 0.0)          # (M,)
    w_mid = 0.5 * (gyr[:-1] + gyr[1:]) - state.bg               # (M, 3)
    a_mid = 0.5 * (acc[:-1] + acc[1:]) * scale_gravity - state.ba

    M = dt.shape[0]
    I3 = jnp.eye(3, dtype=dtype)

    # ---- rotation prefix ------------------------------------------------
    E = so3.exp(w_mid * dt[:, None])                            # (M, 3, 3)
    E = jnp.where(pair_valid[:, None, None], E, I3)
    pref = jax.lax.associative_scan(
        lambda a, b: jnp.einsum("...ij,...jk->...ik", a, b), E)
    # pose at interval START: R_{k-1} = R0 @ prefix_{k-1}
    R_starts = jnp.concatenate([state.R[None],
                                jnp.einsum("ij,mjk->mik", state.R,
                                           pref[:-1])])          # (M, 3, 3)
    R_end = state.R @ pref[-1]

    # ---- velocity / position prefixes -----------------------------------
    a_world = jnp.einsum("mij,mj->mi", R_starts, a_mid) + state.g
    dv = jnp.where(pair_valid[:, None], a_world * dt[:, None], 0.0)
    v_in = state.v + jnp.cumsum(dv, axis=0)                      # v_k
    v_starts = jnp.concatenate([state.v[None], v_in[:-1]])       # v_{k-1}
    dp = jnp.where(pair_valid[:, None],
                   v_starts * dt[:, None]
                   + 0.5 * a_world * (dt * dt)[:, None], 0.0)
    p_in = state.p + jnp.cumsum(dp, axis=0)
    p_starts = jnp.concatenate([state.p[None], p_in[:-1]])
    v_end, p_end = v_in[-1], p_in[-1]

    # ---- covariance: affine pair reduction ------------------------------
    a_hat = so3.hat(a_mid)                                       # (M, 3, 3)
    F = jnp.tile(jnp.eye(DIM, dtype=dtype)[None], (M, 1, 1))
    F = F.at[:, 0:3, 0:3].set(so3.exp(-w_mid * dt[:, None]))
    F = F.at[:, 0:3, 9:12].set(-I3[None] * dt[:, None, None])
    F = F.at[:, 3:6, 6:9].set(I3[None] * dt[:, None, None])
    F = F.at[:, 6:9, 0:3].set(
        -jnp.einsum("mij,mjk->mik", R_starts, a_hat) * dt[:, None, None])
    F = F.at[:, 6:9, 12:15].set(-R_starts * dt[:, None, None])
    dt2 = (dt * dt)[:, None, None]
    Q = jnp.zeros((M, DIM, DIM), dtype=dtype)
    Q = Q.at[:, 0:3, 0:3].set(jnp.diag(cov_gyr)[None] * dt2)
    Q = Q.at[:, 6:9, 6:9].set(
        jnp.einsum("mij,jk,mlk->mil", R_starts, jnp.diag(cov_acc),
                   R_starts) * dt2)
    Q = Q.at[:, 9:12, 9:12].set(jnp.diag(cov_bg)[None] * dt2)
    Q = Q.at[:, 12:15, 12:15].set(jnp.diag(cov_ba)[None] * dt2)
    F = jnp.where(pair_valid[:, None, None], F,
                  jnp.eye(DIM, dtype=dtype)[None])
    Q = jnp.where(pair_valid[:, None, None], Q, 0.0)

    def comp(l, r):
        A1, B1 = l
        A2, B2 = r
        A = jnp.einsum("...ij,...jk->...ik", A2, A1)
        B = (jnp.einsum("...ij,...jk,...lk->...il", A2, B1, A2) + B2)
        return A, B

    A_all, B_all = jax.lax.associative_scan(comp, (F, Q))
    cov = A_all[-1] @ state.cov @ A_all[-1].T + B_all[-1]

    # ---- last valid interval's w / world-accel for end extrapolation ----
    t_key = jnp.where(pair_valid, jnp.arange(M), -1)
    li = jnp.argmax(t_key)
    any_valid = jnp.any(pair_valid)
    w_last = jnp.where(any_valid, w_mid[li], 0.0)
    a_last = jnp.where(any_valid, a_world[li], 0.0)

    poses = ImuPoses(
        offt=jnp.where(pair_valid, heads_t - scan_beg, jnp.inf),
        R=R_starts, p=p_starts, v=v_starts, w=w_mid, a=a_world)

    imu_end = jnp.max(jnp.where(mask > 0, imu_ts, -jnp.inf))
    dte = scan_end - imu_end
    new_state = dataclasses.replace(
        state,
        v=v_end + a_last * dte,
        R=R_end @ so3.exp(w_last * dte),
        p=p_end + v_end * dte + 0.5 * a_last * dte * dte,
        t=scan_end,
        cov=cov,
    )
    return new_state, poses


def deskew(points: jnp.ndarray, offsets: jnp.ndarray, poses: ImuPoses,
           state_end: NavState, R_ext: jnp.ndarray, t_ext: jnp.ndarray):
    """Motion-compensate points (sensor frame at sample time) to the
    scan-end sensor frame (reference ekf_imu.hpp:138-163).

    points: (P, 3), offsets: (P,) seconds from scan begin.
    Invalid pose slots carry offt = +inf and are never selected.
    """
    # last pose with offt <= t (clamp below to the first pose, like the
    # reference leaving earlier points untouched would; with a leading
    # pose at the scan start this is exact)
    idx = jnp.clip(jnp.searchsorted(poses.offt, offsets, side="right") - 1,
                   0, poses.offt.shape[0] - 1)
    offt = poses.offt[idx]
    dt = jnp.where(jnp.isfinite(offt), offsets - offt, 0.0)[:, None]

    Rp = poses.R[idx]                       # (P, 3, 3)
    w = poses.w[idx]
    R_i = Rp @ so3.exp(w * dt)              # pose at point time
    p_i = poses.p[idx] + poses.v[idx] * dt + 0.5 * poses.a[idx] * dt * dt
    T_ei = p_i - state_end.p

    pt_imu = points @ R_ext.T + t_ext       # LiDAR -> IMU
    pt_w = jnp.einsum("pij,pj->pi", R_i, pt_imu) + T_ei
    pt_end = pt_w @ state_end.R             # R_end^T @ x, batched
    out = (pt_end - t_ext) @ R_ext          # R_ext^T @ (x - t_ext)
    return out


def static_init(acc: jnp.ndarray, gyr: jnp.ndarray, mask: jnp.ndarray,
                livox_g_normalized: bool = False):
    """Static initialization: mean acc/gyr over >= 30 samples; gravity is
    -mean_acc (scaled by 9.8 for g-normalized Livox IMUs).
    Reference IMUEKF::IMU_init + process (ekf_imu.hpp:167-209).

    Returns (gravity, mean_gyr, scale_gravity, n_samples).
    """
    m = mask.astype(acc.dtype)
    n = jnp.maximum(jnp.sum(m), 1.0)
    mean_acc = jnp.sum(acc * m[:, None], axis=0) / n
    mean_gyr = jnp.sum(gyr * m[:, None], axis=0) / n
    norm = jnp.linalg.norm(mean_acc)
    scale = jnp.where(jnp.logical_and(livox_g_normalized, norm < 2.0), 9.8, 1.0)
    gravity = -mean_acc * scale
    return gravity, mean_gyr, scale, jnp.sum(m)
