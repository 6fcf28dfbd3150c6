"""On-manifold IMU preintegration as a fused `lax.scan`.

Capability parity with the reference's `IMU_PRE`
(preintegration.hpp:11-331 in the reference tree): delta rotation /
position / velocity with first-order bias Jacobians, 15x15 noise
covariance recursion, composition (`merge`) for window slides, and the
two-state factor residual with bias re-parameterization.

TPU-first differences:
  * integration is one `lax.scan` over padded, masked sample arrays —
    fixed shapes, no data-dependent control flow;
  * the factor Jacobian comes in two cross-checked forms: `evaluate`
    (jax.jacfwd of the exact boxplus-perturbed residual — the oracle)
    and `evaluate_closed` (hand-derived blocks like the reference's
    give_evaluate, ~5x fewer primitive ops — what the LM loop runs);
  * the reference's mutable `dbg/dba` re-parameterization state (with
    LM rollback buffers, preintegration.hpp:296-303) becomes the pure
    function dbg = st.bg - bg_lin, which is algebraically identical and
    needs no rollback.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import so3
from ..core.state import NavState, DIM


@partial(jax.tree_util.register_dataclass,
         data_fields=["R_delta", "p_delta", "v_delta", "R_bg", "p_bg", "p_ba",
                      "v_bg", "v_ba", "dtime", "cov", "bg_lin", "ba_lin"],
         meta_fields=[])
@dataclasses.dataclass
class Preint:
    """Preintegrated IMU factor between two scans. Batchable pytree."""
    R_delta: jnp.ndarray   # (..., 3, 3)
    p_delta: jnp.ndarray   # (..., 3)
    v_delta: jnp.ndarray   # (..., 3)
    R_bg: jnp.ndarray      # (..., 3, 3) dR/dbg
    p_bg: jnp.ndarray      # (..., 3, 3)
    p_ba: jnp.ndarray      # (..., 3, 3)
    v_bg: jnp.ndarray      # (..., 3, 3)
    v_ba: jnp.ndarray      # (..., 3, 3)
    dtime: jnp.ndarray     # (...,)
    cov: jnp.ndarray       # (..., 15, 15)
    bg_lin: jnp.ndarray    # (..., 3) biases at linearization
    ba_lin: jnp.ndarray    # (..., 3)

    @staticmethod
    def identity(bg=None, ba=None, dtype=jnp.float32) -> "Preint":
        z3 = jnp.zeros((3,), dtype)
        z33 = jnp.zeros((3, 3), dtype)
        return Preint(
            R_delta=jnp.eye(3, dtype=dtype), p_delta=z3, v_delta=z3,
            R_bg=z33, p_bg=z33, p_ba=z33, v_bg=z33, v_ba=z33,
            dtime=jnp.zeros((), dtype),
            cov=jnp.zeros((DIM, DIM), dtype),
            bg_lin=z3 if bg is None else bg,
            ba_lin=z3 if ba is None else ba,
        )


def integrate_sequential(gyr: jnp.ndarray, acc: jnp.ndarray, dt: jnp.ndarray,
                         mask: jnp.ndarray, bg: jnp.ndarray, ba: jnp.ndarray,
                         noise_meas: jnp.ndarray, noise_walk: jnp.ndarray,
                         scale_gravity: float = 1.0) -> Preint:
    """Integrate midpoint IMU samples into a Preint (sequential scan —
    ground truth for the log-depth `integrate`).

    gyr/acc: (N, 3) midpoint angular velocity / specific force,
    dt: (N,) interval lengths, mask: (N,) validity (padding-safe).
    Mirrors IMU_PRE::add_imu (preintegration.hpp:75-135): bias Jacobian
    recursions and the 9x9 + 6x6 noise covariance recursion.
    """
    p0 = Preint.identity(bg, ba, dtype=gyr.dtype)

    def step(c: Preint, inp):
        g_i, a_i, dt_i, m_i = inp
        w = (g_i - bg) * m_i
        a = (a_i * scale_gravity - ba) * m_i
        dt_i = dt_i * m_i

        R_inc = so3.exp(w * dt_i)
        R_jr = so3.jr(w * dt_i)
        R_dt = dt_i * c.R_delta
        R_dt2_2 = 0.5 * dt_i * dt_i * c.R_delta
        a_hat = so3.hat(a)

        p_ba = c.p_ba + c.v_ba * dt_i - R_dt2_2
        p_bg = c.p_bg + c.v_bg * dt_i - R_dt2_2 @ a_hat @ c.R_bg
        v_ba = c.v_ba - R_dt
        v_bg = c.v_bg - R_dt @ a_hat @ c.R_bg
        R_bg = R_inc.T @ c.R_bg - R_jr * dt_i

        # 9x9 error-state transition on (dR, dp, dv) + additive walk on biases
        A = jnp.eye(9, dtype=gyr.dtype)
        A = A.at[0:3, 0:3].set(R_inc.T)
        A = A.at[3:6, 0:3].set(-R_dt2_2 @ a_hat)
        A = A.at[3:6, 6:9].set(jnp.eye(3, dtype=gyr.dtype) * dt_i)
        A = A.at[6:9, 0:3].set(-R_dt @ a_hat)
        B = jnp.zeros((9, 6), dtype=gyr.dtype)
        B = B.at[0:3, 0:3].set(R_jr * dt_i)
        B = B.at[3:6, 3:6].set(R_dt2_2)
        B = B.at[6:9, 3:6].set(R_dt)

        cov9 = A @ c.cov[0:9, 0:9] @ A.T + B @ noise_meas @ B.T
        cov = c.cov.at[0:9, 0:9].set(cov9)
        cov = cov.at[9:15, 9:15].add(noise_walk * dt_i)

        p_delta = c.p_delta + c.v_delta * dt_i + R_dt2_2 @ a
        v_delta = c.v_delta + R_dt @ a
        R_delta = c.R_delta @ R_inc

        nxt = Preint(R_delta=R_delta, p_delta=p_delta, v_delta=v_delta,
                     R_bg=R_bg, p_bg=p_bg, p_ba=p_ba, v_bg=v_bg, v_ba=v_ba,
                     dtime=c.dtime + dt_i, cov=cov,
                     bg_lin=c.bg_lin, ba_lin=c.ba_lin)
        return nxt, None

    out, _ = jax.lax.scan(step, p0, (gyr, acc, dt, mask.astype(gyr.dtype)))
    return out


def integrate(gyr: jnp.ndarray, acc: jnp.ndarray, dt: jnp.ndarray,
              mask: jnp.ndarray, bg: jnp.ndarray, ba: jnp.ndarray,
              noise_meas: jnp.ndarray, noise_walk: jnp.ndarray,
              scale_gravity: float = 1.0) -> Preint:
    """Log-depth preintegration: same result as `integrate_sequential`.

    Preintegration composition is exactly `merge` (the window-slide
    composition), which is associative — so the N-sample fold becomes
    per-sample atomic Preints (one masked step each, batched) reduced
    with `jax.lax.associative_scan(merge)` in log2(N) fused levels
    instead of N sequential scan steps (dispatch-bound on TPU).
    """
    atomic = jax.vmap(
        lambda g, a, d, m: _one_step(g, a, d, m, bg, ba, noise_meas,
                                     noise_walk, scale_gravity))(
        gyr, acc, dt, mask.astype(gyr.dtype))
    pref = jax.lax.associative_scan(jax.vmap(merge), atomic)
    return jax.tree.map(lambda x: x[-1], pref)


def _one_step(g_i, a_i, dt_i, m_i, bg, ba, noise_meas, noise_walk,
              scale_gravity):
    """Atomic single-interval Preint (integrate_sequential's step from
    the identity)."""
    p0 = Preint.identity(bg, ba, dtype=g_i.dtype)
    w = (g_i - bg) * m_i
    a = (a_i * scale_gravity - ba) * m_i
    dt_i = dt_i * m_i

    R_inc = so3.exp(w * dt_i)
    R_jr = so3.jr(w * dt_i)
    dtype = g_i.dtype
    R_dt = dt_i * jnp.eye(3, dtype=dtype)
    R_dt2_2 = 0.5 * dt_i * dt_i * jnp.eye(3, dtype=dtype)
    a_hat = so3.hat(a)

    B = jnp.zeros((9, 6), dtype=dtype)
    B = B.at[0:3, 0:3].set(R_jr * dt_i)
    B = B.at[3:6, 3:6].set(R_dt2_2)
    B = B.at[6:9, 3:6].set(R_dt)
    cov = jnp.zeros((DIM, DIM), dtype=dtype)
    cov = cov.at[0:9, 0:9].set(B @ noise_meas @ B.T)
    cov = cov.at[9:15, 9:15].set(noise_walk * dt_i)

    return Preint(
        R_delta=R_inc,
        p_delta=R_dt2_2 @ a,
        v_delta=R_dt @ a,
        R_bg=R_inc.T @ p0.R_bg - R_jr * dt_i,
        p_bg=-R_dt2_2 @ a_hat @ p0.R_bg,
        p_ba=-R_dt2_2,
        v_bg=-R_dt @ a_hat @ p0.R_bg,
        v_ba=-R_dt,
        dtime=dt_i, cov=cov, bg_lin=p0.bg_lin, ba_lin=p0.ba_lin)


def merge(a: Preint, b: Preint) -> Preint:
    """Compose two consecutive preintegrations (window slide merging the two
    oldest intervals; reference IMU_PRE::merge, preintegration.hpp:305-329)."""
    p_bg = a.p_bg + a.v_bg * b.dtime + a.R_delta @ (b.p_bg - so3.hat(b.p_delta) @ a.R_bg)
    p_ba = a.p_ba + a.v_ba * b.dtime + a.R_delta @ b.p_ba
    v_bg = a.v_bg + a.R_delta @ (b.v_bg - so3.hat(b.v_delta) @ a.R_bg)
    v_ba = a.v_ba + a.R_delta @ b.v_ba
    R_bg = b.R_delta.T @ a.R_bg + b.R_bg

    Ai = jnp.eye(DIM, dtype=a.cov.dtype)
    Ai = Ai.at[0:3, 0:3].set(b.R_delta.T)
    Ai = Ai.at[3:6, 0:3].set(-a.R_delta @ so3.hat(b.p_delta))
    Ai = Ai.at[3:6, 6:9].set(jnp.eye(3, dtype=a.cov.dtype) * b.dtime)
    Ai = Ai.at[6:9, 0:3].set(-a.R_delta @ so3.hat(b.v_delta))
    Bi = jnp.eye(DIM, dtype=a.cov.dtype)
    Bi = Bi.at[3:6, 3:6].set(a.R_delta)
    Bi = Bi.at[6:9, 6:9].set(a.R_delta)
    cov = Ai @ a.cov @ Ai.T + Bi @ b.cov @ Bi.T

    return Preint(
        R_delta=a.R_delta @ b.R_delta,
        p_delta=a.p_delta + a.v_delta * b.dtime + a.R_delta @ b.p_delta,
        v_delta=a.v_delta + a.R_delta @ b.v_delta,
        R_bg=R_bg, p_bg=p_bg, p_ba=p_ba, v_bg=v_bg, v_ba=v_ba,
        dtime=a.dtime + b.dtime, cov=cov,
        bg_lin=a.bg_lin, ba_lin=a.ba_lin,
    )


def residual(pre: Preint, st1: NavState, st2: NavState) -> jnp.ndarray:
    """15-dim preintegration residual (reference give_evaluate,
    preintegration.hpp:137-162), with the bias re-parameterization
    dbg/dba computed from the states directly."""
    dbg = st1.bg - pre.bg_lin
    dba = st1.ba - pre.ba_lin
    R_corr = pre.R_delta @ so3.exp(pre.R_bg @ dbg)
    t_corr = pre.p_delta + pre.p_bg @ dbg + pre.p_ba @ dba
    v_corr = pre.v_delta + pre.v_bg @ dbg + pre.v_ba @ dba

    dtime = pre.dtime
    res_r = so3.log(R_corr.T @ st1.R.T @ st2.R)
    exp_v = st1.R.T @ (st2.v - st1.v - dtime * st1.g)
    exp_t = st1.R.T @ (st2.p - st1.p - st1.v * dtime - 0.5 * dtime * dtime * st1.g)
    return jnp.concatenate([
        res_r,
        exp_t - t_corr,
        exp_v - v_corr,
        st2.bg - st1.bg,
        st2.ba - st1.ba,
    ])


def _perturbed_residual(dx1, dx2, dg, pre, st1, st2):
    st1p = st1.boxplus(dx1)
    st1p = dataclasses.replace(st1p, g=st1.g + dg)
    st2p = st2.boxplus(dx2)
    return residual(pre, st1p, st2p)


def evaluate(pre: Preint, st1: NavState, st2: NavState,
             with_gravity: bool = False, Winv: jnp.ndarray | None = None):
    """Residual, chi2 and Gauss-Newton pieces for one IMU factor.

    Returns (chi2, JtWJ, JtWr) where the state layout is
    [dx1 (15), dx2 (15)] (+ [dg (3)] when with_gravity, matching the
    reference give_evaluate_g, preintegration.hpp:214-294). Winv
    optionally carries the precomputed covariance inverse (see
    cov_inv).
    """
    z15 = jnp.zeros((DIM,), pre.p_delta.dtype)
    z3 = jnp.zeros((3,), pre.p_delta.dtype)
    r = residual(pre, st1, st2)
    J1, J2, Jg = jax.jacfwd(_perturbed_residual, argnums=(0, 1, 2))(
        z15, z15, z3, pre, st1, st2)
    if with_gravity:
        J = jnp.concatenate([J1, J2, Jg], axis=1)   # (15, 33)
    else:
        J = jnp.concatenate([J1, J2], axis=1)        # (15, 30)
    W = cov_inv(pre) if Winv is None else Winv
    JtW = J.T @ W
    return r @ W @ r, JtW @ J, JtW @ r


def jacobian_closed(pre: Preint, st1: NavState, st2: NavState,
                    with_gravity: bool = False) -> jnp.ndarray:
    """Closed-form Jacobian of `residual` wrt the boxplus perturbations
    [dx1 (15), dx2 (15)] (+ [dg (3)]) — the reference's hand-derived
    give_evaluate[_g] blocks (preintegration.hpp:137-294), matching
    jax.jacfwd(_perturbed_residual) to first order exactly but with ~5x
    fewer primitive ops (the jacfwd path re-traces the residual with 33
    tangents; inside the LM while-loop each primitive is a separate
    small TPU kernel, so op count is the cost driver).

    Derivation (right perturbation R <- R exp(phi^)):
      e_r = Log(exp(-c^) dR^T A),  c = R_bg dbg,  A = R1^T R2
        d/dphi1 = -jr_inv(e_r) A^T
        d/dphi2 =  jr_inv(e_r)
        d/dbg1  = -jr_inv(e_r) (dR^T A)^T jr(-c) R_bg
      e_t = R1^T x_t - t_corr, x_t = p2 - p1 - v1 dt - dt^2/2 g
        d/dphi1 = hat(R1^T x_t); d/dp = -+R1^T; d/dv1 = -dt R1^T
        d/dbg1 = -p_bg; d/dba1 = -p_ba; d/dg = -dt^2/2 R1^T
      e_v analogous with x_v = v2 - v1 - dt g and v_bg/v_ba.
    """
    dtype = pre.p_delta.dtype
    dt = pre.dtime
    R1T = st1.R.T
    A = R1T @ st2.R
    dbg = st1.bg - pre.bg_lin
    c = pre.R_bg @ dbg
    B = pre.R_delta.T @ A
    e_r = so3.log(so3.exp(c).T @ B)
    jri = so3.jr_inv(e_r)

    x_t = st2.p - st1.p - st1.v * dt - 0.5 * dt * dt * st1.g
    x_v = st2.v - st1.v - dt * st1.g
    y_t = R1T @ x_t
    y_v = R1T @ x_v

    Z = jnp.zeros((3, 3), dtype)
    I = jnp.eye(3, dtype=dtype)

    # rows: e_r, e_t, e_v, e_bg, e_ba; cols per state: [phi, p, v, bg, ba]
    r_r1 = [-jri @ A.T, Z, Z, -jri @ B.T @ so3.jr(-c) @ pre.R_bg, Z]
    r_r2 = [jri, Z, Z, Z, Z]
    r_t1 = [so3.hat(y_t), -R1T, -dt * R1T, -pre.p_bg, -pre.p_ba]
    r_t2 = [Z, R1T, Z, Z, Z]
    r_v1 = [so3.hat(y_v), Z, -R1T, -pre.v_bg, -pre.v_ba]
    r_v2 = [Z, Z, R1T, Z, Z]
    r_bg1 = [Z, Z, Z, -I, Z]
    r_bg2 = [Z, Z, Z, I, Z]
    r_ba1 = [Z, Z, Z, Z, -I]
    r_ba2 = [Z, Z, Z, Z, I]

    J1 = jnp.concatenate([
        jnp.concatenate(r_r1, axis=1),
        jnp.concatenate(r_t1, axis=1),
        jnp.concatenate(r_v1, axis=1),
        jnp.concatenate(r_bg1, axis=1),
        jnp.concatenate(r_ba1, axis=1),
    ], axis=0)
    J2 = jnp.concatenate([
        jnp.concatenate(r_r2, axis=1),
        jnp.concatenate(r_t2, axis=1),
        jnp.concatenate(r_v2, axis=1),
        jnp.concatenate(r_bg2, axis=1),
        jnp.concatenate(r_ba2, axis=1),
    ], axis=0)
    if not with_gravity:
        return jnp.concatenate([J1, J2], axis=1)
    Jg = jnp.concatenate([Z, -0.5 * dt * dt * R1T, -dt * R1T, Z, Z], axis=0)
    return jnp.concatenate([J1, J2, Jg], axis=1)


def evaluate_closed(pre: Preint, st1: NavState, st2: NavState,
                    with_gravity: bool = False,
                    Winv: jnp.ndarray | None = None):
    """`evaluate` with the closed-form Jacobian (see jacobian_closed)."""
    r = residual(pre, st1, st2)
    J = jacobian_closed(pre, st1, st2, with_gravity)
    W = cov_inv(pre) if Winv is None else Winv
    JtW = J.T @ W
    return r @ W @ r, JtW @ J, JtW @ r


def cov_inv(pre: Preint) -> jnp.ndarray:
    """Robust inverse of the preintegration covariance. The covariance
    is FIXED across an LM solve (bias reparameterization moves the
    residual, not the noise), so callers hoist this out of the
    iteration loop — the batched 15x15 LU inversions were the dominant
    cost of the windowed LI-BA as measured on TPU."""
    return jnp.linalg.inv(pre.cov + jnp.eye(DIM, dtype=pre.cov.dtype) * 1e-12)


def chi2(pre: Preint, st1: NavState, st2: NavState,
         Winv: jnp.ndarray | None = None) -> jnp.ndarray:
    r = residual(pre, st1, st2)
    W = cov_inv(pre) if Winv is None else Winv
    return r @ W @ r
