"""Levenberg-Marquardt optimizers for the sliding window.

Capability parity with the reference's three LM solvers
(voxel_map.hpp:342-976 in the reference tree):

  * lm_lidar      — 6-DoF x W poses, LiDAR eigen factors only
                    (Lidar_BA_Optimizer; used by HBA)
  * lm_li         — 15-DoF x W (pose+vel+bias) = LiDAR + preintegration
                    factors weighted by imu_coef (LI_BA_Optimizer)
  * lm_li_gravity — same + a shared 3-DoF gravity column
                    (LI_BA_OptimizerGravity; init / post-loop reloc)

All three run the reference's Nielsen damping schedule
(voxel_map.hpp:422-497) inside a `lax.while_loop`: accept/reject with
rho = (r1 - r2) / q1, u <- u * max(1/3, 1 - (2 rho - 1)^3) on accept,
u <- u*v, v <- 2v on reject; gauge fixed by pinning the first frame
(zero rows/cols + identity block, voxel_map.hpp:452-455).

The dense normal systems are tiny (60 / 150 / 153), so each LM iteration
is one fused device computation; the Hessian is exact — the closed-form
eigen-perturbation assembly `lidar_factor.hess_grad_ct_t` over the
factor-MINOR layout (factor axis last = TPU lanes; `transpose_factors`
is hoisted out of the LM loop, and `map.harvest_t` emits the layout
directly). The autodiff builders and the factor-major `hess_grad_ct`
are kept as cross-checked references; measured in the fused scan step
the closed form cut harvest+LM from 18.8 to 10.7 ms, and the
factor-minor relayout removed the remaining transpose traffic.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import so3
from ..core.state import NavState, DIM
from ..imu import preintegration as pre
from . import lidar_factor as lf

_REL_TOL = 1e-6


def _solve_scaled(H: jnp.ndarray, g: jnp.ndarray) -> jnp.ndarray:
    """Solve H dx = -g with Jacobi scaling (f32-friendly)."""
    d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-12))
    Hs = H / d[:, None] / d[None, :]
    gs = g / d
    dx = jnp.linalg.solve(Hs, -gs)
    return dx / d


def _gauge_fix(H: jnp.ndarray, g: jnp.ndarray, dim: int):
    H = H.at[:dim, :].set(0.0)
    H = H.at[:, :dim].set(0.0)
    H = H.at[:dim, :dim].set(jnp.eye(dim, dtype=H.dtype))
    g = g.at[:dim].set(0.0)
    return H, g


def _nielsen_update(u, v, rho):
    q = 1.0 - (2.0 * rho - 1.0) ** 3
    u_acc = u * jnp.maximum(q, 1.0 / 3.0)
    return u_acc, jnp.float32(2.0)


# ---------------------------------------------------------------------------
# LiDAR-only LM over (W, 6) poses
# ---------------------------------------------------------------------------

def lm_lidar(Rs, ps, factors: lf.FactorBatch, win_mask, max_iter: int = 3,
             u0: float = 0.01):
    """Returns (Rs, ps, H, resi0, resi1, converged)."""
    W = Rs.shape[0]
    n6 = W * 6

    ft = (lf.transpose_factors(factors)
          if isinstance(factors, lf.FactorBatch) else factors)

    def full_eval(Rs, ps):
        H, g = lf.hess_grad_ct_t(ft, Rs, ps, win_mask)
        r = lf.cost_t(ft, Rs, ps, win_mask)
        return H, g, r

    H0, g0, r0 = full_eval(Rs, ps)

    def body(c):
        it, u, v, Rs, ps, H, g, r1, conv = c
        Hf, gf = _gauge_fix(H, g, 6)
        # dead frames (win_mask 0, e.g. padded HBA windows) have zero
        # rows -> pin them with identity so the solve stays regular and
        # their update is exactly zero
        Hf = Hf + jnp.diag(jnp.repeat(1.0 - win_mask, 6))
        D = jnp.diag(jnp.diag(Hf))
        dx = _solve_scaled(Hf + u * D, gf)
        dxw = dx.reshape(W, 6)
        Rs_n = Rs @ so3.exp(dxw[:, 0:3])
        ps_n = ps + dxw[:, 3:6]
        q1 = 0.5 * jnp.dot(dx, u * (D @ dx) - gf)
        r2 = lf.cost_t(ft, Rs_n, ps_n, win_mask)
        q = r1 - r2
        accept = q > 0
        rho = q / jnp.maximum(q1, 1e-20)
        u_acc, v_acc = _nielsen_update(u, v, rho)

        Rs = jnp.where(accept, Rs_n, Rs)
        ps = jnp.where(accept, ps_n, ps)
        H_n, g_n, _ = full_eval(Rs, ps)
        H = jnp.where(accept, H_n, H)
        g = jnp.where(accept, g_n, g)
        r1_n = jnp.where(accept, r2, r1)
        u = jnp.where(accept, u_acc, u * v)
        v = jnp.where(accept, v_acc, 2.0 * v)
        conv = conv & accept
        done_tol = jnp.abs(q / jnp.maximum(r1, 1e-20)) < _REL_TOL
        it = jnp.where(done_tol, max_iter, it + 1)
        return it, u, v, Rs, ps, H, g, r1_n, conv

    def cond(c):
        return c[0] < max_iter

    c0 = (jnp.int32(0), jnp.float32(u0), jnp.float32(2.0), Rs, ps, H0, g0,
          r0, jnp.bool_(True))
    it, u, v, Rs, ps, H, g, r1, conv = jax.lax.while_loop(cond, body, c0)
    return Rs, ps, H, r0, r1, conv


# ---------------------------------------------------------------------------
# LiDAR-inertial LM over (W, 15) states [+ shared gravity]
# ---------------------------------------------------------------------------

def _block_place(blocks: jnp.ndarray, mask2d: jnp.ndarray, W: int) -> jnp.ndarray:
    """Place per-index (K, B, B) blocks into a (W*B, W*B) matrix at the
    (i, j) positions where mask2d (K, W, W) is 1 — scatter-free (element
    scatters with computed 2D indices run serially on TPU at ~0.2 us/elem;
    the masked broadcast + reshape form stays fully fused)."""
    B = blocks.shape[-1]
    grid = jnp.einsum("kij,kab->iajb", mask2d, blocks)
    return grid.reshape(W * B, W * B)


def _imu_terms(states: NavState, preints: pre.Preint, imu_coef,
               with_gravity, Winv=None, pair_mask=None):
    """Stacked IMU factor contributions. states: batched (W,); preints:
    batched (W-1,). Returns (H, g, chi) in the (15W [+3]) layout.
    Winv: optional (W-1, 15, 15) precomputed covariance inverses.
    pair_mask: optional (W-1,) 0/1 — zero rows drop that preintegration
    pair (partial windows, e.g. post-loop relocalization)."""
    W = states.t.shape[0]
    n = W * DIM + (3 if with_gravity else 0)

    st1 = states[slice(0, W - 1)]
    st2 = states[slice(1, W)]
    if Winv is None:
        Winv = jax.vmap(pre.cov_inv)(preints)
    ev = jax.vmap(
        lambda p, a, b, w: pre.evaluate_closed(p, a, b, with_gravity, w))
    chi, jtj, gg = ev(preints, st1, st2, Winv)
    if pair_mask is not None:
        chi = chi * pair_mask
        jtj = jtj * pair_mask[:, None, None]
        gg = gg * pair_mask[:, None]

    # scatter-free assembly of the block-tridiagonal chain: quadrants of
    # each pair's (30, 30) block placed by eye/off-diagonal masks
    K = W - 1
    eye_i = jnp.eye(W)[:K]                                # (K, W) row i
    eye_j = jnp.eye(W)[1:]                                # (K, W) row i+1
    m_ii = eye_i[:, :, None] * eye_i[:, None, :]          # (K, W, W)
    m_ij = eye_i[:, :, None] * eye_j[:, None, :]
    m_ji = eye_j[:, :, None] * eye_i[:, None, :]
    m_jj = eye_j[:, :, None] * eye_j[:, None, :]
    D = DIM
    H0 = (_block_place(jtj[:, 0:D, 0:D], m_ii, W)
          + _block_place(jtj[:, 0:D, D:2 * D], m_ij, W)
          + _block_place(jtj[:, D:2 * D, 0:D], m_ji, W)
          + _block_place(jtj[:, D:2 * D, D:2 * D], m_jj, W))
    g0 = (jnp.einsum("kw,ka->wa", eye_i, gg[:, 0:D])
          + jnp.einsum("kw,ka->wa", eye_j, gg[:, D:2 * D])).reshape(-1)
    if with_gravity:
        H = jnp.zeros((n, n)).at[:W * D, :W * D].set(H0)
        # gravity rows/cols: sum over pairs of the (33, 3) strips
        Hg1 = jnp.einsum("kw,kag->wag", eye_i,
                         jtj[:, 0:D, 2 * D:]).reshape(W * D, 3)
        Hg2 = jnp.einsum("kw,kag->wag", eye_j,
                         jtj[:, D:2 * D, 2 * D:]).reshape(W * D, 3)
        Hg = Hg1 + Hg2
        H = H.at[:W * D, n - 3:].set(Hg)
        H = H.at[n - 3:, :W * D].set(Hg.T)
        H = H.at[n - 3:, n - 3:].set(jnp.sum(jtj[:, 2 * D:, 2 * D:], axis=0))
        g = jnp.concatenate([g0, jnp.sum(gg[:, 2 * D:], axis=0)])
    else:
        H = H0
        g = g0
    return H * imu_coef, g * imu_coef, jnp.sum(chi) * imu_coef * 0.5


def _apply_dx(states: NavState, dx: jnp.ndarray, with_gravity: bool):
    W = states.t.shape[0]
    body = dx[:W * DIM].reshape(W, DIM)
    out = states.boxplus(body)
    if with_gravity:
        out = dataclasses.replace(out, g=states.g + dx[W * DIM:])
    return out


GRAVITY_NORM = 9.81


def _gravity_prior(g_vec, weight):
    """Soft prior on |g| = 9.81 — collapses the velocity/gravity null
    direction of short init windows (the reference instead hard-gates
    |g| in [9.6, 10.0] and resets on failure, voxelslam.cpp:766)."""
    def rg(dg):
        return jnp.linalg.norm(g_vec + dg) - GRAVITY_NORM
    r = rg(jnp.zeros(3))
    J = jax.jacfwd(rg)(jnp.zeros(3))
    return weight * jnp.outer(J, J), weight * J * r, weight * r * r


def _li_eval(states: NavState, factors, preints, win_mask, imu_coef,
             with_gravity, g_prior_w=0.0, Winv=None, pair_mask=None):
    """Full residual + Hessian/gradient in the 15W [+3] layout."""
    W = states.t.shape[0]
    n = W * DIM + (3 if with_gravity else 0)
    H_imu, g_imu, r_imu = _imu_terms(states, preints, imu_coef,
                                     with_gravity, Winv, pair_mask)

    Hl, gl = lf.hess_grad_ct_t(factors, states.R, states.p, win_mask)
    rl = lf.cost_t(factors, states.R, states.p, win_mask)
    # embed the (6W, 6W) pose system into the 15W layout scatter-free:
    # zero-pad each 6-block to 15 and re-flatten
    Hl4 = Hl.reshape(W, 6, W, 6)
    Hl4 = jnp.pad(Hl4, ((0, 0), (0, DIM - 6), (0, 0), (0, DIM - 6)))
    gl2 = jnp.pad(gl.reshape(W, 6), ((0, 0), (0, DIM - 6)))
    nW = W * DIM
    H = H_imu.at[:nW, :nW].add(Hl4.reshape(nW, nW))
    g = g_imu.at[:nW].add(gl2.reshape(nW))
    r = r_imu + rl
    if with_gravity and g_prior_w > 0:
        Hg, gg, rg = _gravity_prior(states.g[0], g_prior_w)
        H = H.at[n - 3:, n - 3:].add(Hg)
        g = g.at[n - 3:].add(gg)
        r = r + rg
    return H, g, r


def _li_residual(states, factors, preints, win_mask, imu_coef,
                 g_prior_w=0.0, Winv=None, pair_mask=None):
    W = states.t.shape[0]
    st1 = states[slice(0, W - 1)]
    st2 = states[slice(1, W)]
    if Winv is None:
        Winv = jax.vmap(pre.cov_inv)(preints)
    chi = jax.vmap(pre.chi2)(preints, st1, st2, Winv)
    if pair_mask is not None:
        chi = chi * pair_mask
    rl = lf.cost_t(factors, states.R, states.p, win_mask)
    r = jnp.sum(chi) * imu_coef * 0.5 + rl
    rg = jnp.linalg.norm(states.g[0]) - GRAVITY_NORM
    return r + g_prior_w * rg * rg


def lm_li(states: NavState, factors: lf.FactorBatch, preints: pre.Preint,
          win_mask, imu_coef: float = 1e-4, max_iter: int = 3,
          u0: float = 0.01, with_gravity: bool = False,
          g_prior_w: float = 0.0, pair_mask=None):
    """LiDAR-inertial windowed LM. states: batched NavState (W,);
    preints: batched Preint (W-1,). Returns (states, H, r0, r1, conv).

    pair_mask: optional (W-1,) 0/1 dropping IMU pairs of dead frames
    (partial windows); dead frames (win_mask 0 AND both pairs dead) get
    an identity diagonal so the damped solve stays non-singular and
    their update is exactly zero."""
    W = states.t.shape[0]
    n = W * DIM + (3 if with_gravity else 0)

    # hoist the preintegration covariance inverses: fixed across the LM
    # (bias reparameterization moves the residual, not the noise)
    Winv = jax.vmap(pre.cov_inv)(preints)
    # factor-minor relayout, also hoisted; map.harvest_t emits this
    # layout directly (see lidar_factor.transpose_factors)
    if isinstance(factors, lf.FactorBatch):
        factors = lf.transpose_factors(factors)
    H0, g0, r0 = _li_eval(states, factors, preints, win_mask, imu_coef,
                          with_gravity, g_prior_w, Winv, pair_mask)
    dead_diag = jnp.zeros((n,))
    if pair_mask is not None:
        dead_diag = dead_diag.at[:W * DIM].set(
            jnp.repeat(1.0 - win_mask, DIM))

    def body(c):
        it, u, v, states, H, g, r1, conv = c
        Hf, gf = _gauge_fix(H, g, DIM)
        Hf = Hf + jnp.diag(dead_diag)
        D = jnp.diag(jnp.diag(Hf))
        dx = _solve_scaled(Hf + u * D, gf)
        st_n = _apply_dx(states, dx, with_gravity)
        q1 = 0.5 * jnp.dot(dx, u * (D @ dx) - gf)
        r2 = _li_residual(st_n, factors, preints, win_mask, imu_coef,
                          g_prior_w, Winv, pair_mask)
        q = r1 - r2
        accept = q > 0
        rho = q / jnp.maximum(q1, 1e-20)
        u_acc, v_acc = _nielsen_update(u, v, rho)

        states = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), st_n, states)
        H_n, g_n, _ = _li_eval(states, factors, preints, win_mask, imu_coef,
                               with_gravity, g_prior_w, Winv, pair_mask)
        H = jnp.where(accept, H_n, H)
        g = jnp.where(accept, g_n, g)
        r1_n = jnp.where(accept, r2, r1)
        u = jnp.where(accept, u_acc, u * v)
        v = jnp.where(accept, v_acc, 2.0 * v)
        conv = conv & accept
        done_tol = jnp.abs(q / jnp.maximum(r1, 1e-20)) < _REL_TOL
        it = jnp.where(done_tol, max_iter, it + 1)
        return it, u, v, states, H, g, r1_n, conv

    c0 = (jnp.int32(0), jnp.float32(u0), jnp.float32(2.0), states, H0, g0,
          r0, jnp.bool_(True))
    out = jax.lax.while_loop(lambda c: c[0] < max_iter, body, c0)
    it, u, v, states, H, g, r1, conv = out
    return states, H, r0, r1, conv


def lm_li_gravity(states, factors, preints, win_mask, imu_coef=1e-4,
                  max_iter: int = 3, u0: float = 0.01,
                  g_prior_w: float = 0.0, pair_mask=None):
    return lm_li(states, factors, preints, win_mask, imu_coef, max_iter, u0,
                 with_gravity=True, g_prior_w=g_prior_w,
                 pair_mask=pair_mask)
