"""The point-cluster eigenvalue LiDAR BA factor (BALM2-style).

Capability parity with the reference `LidarFactor`
(voxel_map.hpp:124-339 in the reference tree): per harvested plane voxel,
the cost is

    coeff * lambda_0( Cov( fix + sum_i T_i . win_i ) )

— the smallest eigenvalue of the combined point covariance, whose
gradient/Hessian w.r.t. all window poses the reference assembles by hand
(acc_evaluate2). Two equivalent exact Newton-system builders are
provided: `hess_grad` (jacfwd-of-grad, currently fastest on TPU) and
`hess_grad_analytic` (second-order eigenvalue perturbation assembly,
kept for a layout-conscious rewrite).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from ..core import so3
from ..core import cluster as cl
from ..core.cluster import Cluster
from ..core.eig3 import eigh3


@partial(jax.tree_util.register_dataclass,
         data_fields=["win", "fix", "coeff", "valid"], meta_fields=[])
@dataclasses.dataclass
class FactorBatch:
    """Harvested plane factors: win (F, W) local clusters per window frame,
    fix (F,) world cluster of marginalized points."""
    win: Cluster          # leaves (F, W, ...)
    fix: Cluster          # leaves (F, ...)
    coeff: jnp.ndarray    # (F,)
    valid: jnp.ndarray    # (F,) bool


def total_clusters(f: FactorBatch, Rs: jnp.ndarray, ps: jnp.ndarray,
                   win_mask: jnp.ndarray) -> Cluster:
    """Combined world cluster per factor. Rs: (W,3,3), ps: (W,3),
    win_mask: (W,) validity of window frames.

    One-pass anchored reduction over the window axis (exact centered
    moments — the W-step merge chain of pairwise `cl.merge`s costs a
    sequential chain of divisions per factor and is what the 60-tangent
    Hessian JVPs would otherwise differentiate through)."""
    m = win_mask
    n_w = f.win.n * m[None, :]                                    # (F, W)
    mu_w = jnp.einsum("wij,fwj->fwi", Rs, f.win.mu) + ps[None]    # (F, W, 3)
    S_w = jnp.einsum("wij,fwjk,wlk->fwil", Rs, f.win.S, Rs)       # (F, W, 3, 3)

    n_t = f.fix.n + jnp.sum(n_w, axis=1)
    inv_n = 1.0 / jnp.maximum(n_t, 1.0)
    mu_t = (f.fix.n[:, None] * f.fix.mu
            + jnp.einsum("fw,fwi->fi", n_w, mu_w)) * inv_n[:, None]
    d_w = mu_w - mu_t[:, None]
    d_f = f.fix.mu - mu_t
    S_t = (f.fix.S
           + f.fix.n[:, None, None] * (d_f[:, :, None] * d_f[:, None, :])
           + jnp.einsum("fwij,w->fij", S_w, m)
           + jnp.einsum("fw,fwi,fwj->fij", n_w, d_w, d_w))
    empty = (n_t == 0)[:, None]
    mu_t = jnp.where(empty, 0.0, mu_t)
    S_t = jnp.where(empty[..., None], 0.0, S_t)
    return Cluster(n=n_t, mu=mu_t, S=S_t)


def cost(f: FactorBatch, Rs: jnp.ndarray, ps: jnp.ndarray,
         win_mask: jnp.ndarray) -> jnp.ndarray:
    """Total eigen-factor residual sum_f coeff_f * lambda0_f (reference
    evaluate_only_residual, voxel_map.hpp:285-325)."""
    total = total_clusters(f, Rs, ps, win_mask)
    lam, _ = eigh3(cl.cov(total))
    w = f.coeff * f.valid * (total.n > 0)
    return jnp.sum(w * lam[:, 0])


def cost_at(f: FactorBatch, Rs0, ps0, dx: jnp.ndarray, win_mask):
    """Cost at right-perturbed poses; dx: (W, 6) = [rot, trans] per frame."""
    Rs = Rs0 @ so3.exp(dx[:, 0:3])
    ps = ps0 + dx[:, 3:6]
    return cost(f, Rs, ps, win_mask)


def grad(f: FactorBatch, Rs0, ps0, win_mask) -> jnp.ndarray:
    """(W, 6) gradient of the eigen cost at the current poses."""
    W = Rs0.shape[0]
    z = jnp.zeros((W, 6), Rs0.dtype)
    return jax.grad(lambda d: cost_at(f, Rs0, ps0, d, win_mask))(z)


def hess_grad(f: FactorBatch, Rs0, ps0, win_mask):
    """Exact (6W, 6W) Hessian + (6W,) gradient via jacfwd-of-grad
    (6W tangent passes through the full cost incl. the eigensolve).
    Counter-intuitively this is currently the FASTEST formulation on
    TPU: the tangent batch vectorizes cleanly, while the analytic
    assembly below materializes (F, W, 6, 3, 3) intermediates whose
    small trailing dims tile-pad badly (measured 58 vs 48 ms/scan in
    the fused step). `hess_grad_analytic` is kept exact + tested for a
    future layout-conscious rewrite."""
    W = Rs0.shape[0]
    z = jnp.zeros((W * 6,), Rs0.dtype)

    def g(dflat):
        return jax.grad(
            lambda d: cost_at(f, Rs0, ps0, d.reshape(W, 6), win_mask))(dflat.reshape(W, 6)).reshape(-1)

    H = jax.jacfwd(g)(z)
    J = g(z)
    H = 0.5 * (H + H.T)
    return H, J


def _frame_moments(Rw, pw, n, mu, S, m, d):
    """World-frame raw moments of ONE frame's cluster under a right
    pose perturbation d = [rot, trans]. Returns (P, mn) with
    P = m (R' S R'^T + n mu' mu'^T) and mn = m n mu'."""
    Rd = Rw @ so3.exp(d[0:3])
    mu_w = Rd @ mu + pw + d[3:6]
    P = m * (Rd @ S @ Rd.T + n * jnp.outer(mu_w, mu_w))
    mn = (m * n) * mu_w
    return P, mn


def hess_grad_analytic(f: FactorBatch, Rs0, ps0, win_mask):
    """Exact (6W, 6W) Hessian + (6W,) gradient of the eigen cost —
    analytic eigen-perturbation assembly (the reference's hand-derived
    acc_evaluate2, voxel_map.hpp:150-282, re-derived for the centered
    TPU layout).

    Writing the combined covariance C = P_t/N - mu_t mu_t^T (N constant,
    P_t/mu_t sums of per-frame world moments), the classic second-order
    eigenvalue perturbation gives

      d lam0[a]    = u0^T dC[a] u0
      d2 lam0[a,b] = u0^T d2C[a,b] u0
                     + 2 sum_{k!=0} (u0^T dC[a] uk)(uk^T dC[b] u0)
                                    / (lam0 - lamk)

    dC[a] is local to one frame's 6 tangents (plus the global-mean
    coupling, handled in closed form), so the moment jacobians are tiny
    per-(factor, frame) jacfwd/hessian passes over `_frame_moments`
    instead of 6W tangents through the whole cost + eigensolve. The
    cross-frame Hessian reduces to small batched matmuls (MXU)."""
    W = Rs0.shape[0]
    F = f.coeff.shape[0]
    dtype = Rs0.dtype
    m = win_mask.astype(dtype)

    total = total_clusters(f, Rs0, ps0, win_mask)
    N = jnp.maximum(total.n, 1.0)                       # (F,)
    mu_t = total.mu                                     # (F, 3)
    lam, U = eigh3(cl.cov(total))                       # (F,3), (F,3,3)
    u0 = U[:, :, 0]                                     # (F, 3)
    wgt = (f.coeff * f.valid * (total.n > 0)).astype(dtype)   # (F,)

    z6 = jnp.zeros((6,), dtype)

    # ---- first derivatives of per-frame moments: (F, W, 6, 3, 3/3) ----
    def jac_fw(Rw, pw, mw, n, mu, S):
        jP, jmn = jax.jacfwd(
            lambda d: _frame_moments(Rw, pw, n, mu, S, mw, d))(z6)
        # jacfwd puts the tangent axis LAST: (3,3,6) / (3,6)
        return jnp.moveaxis(jP, -1, 0), jnp.moveaxis(jmn, -1, 0)

    jac_w = jax.vmap(jac_fw)                            # over W
    dP, dmn = jax.vmap(
        lambda n, mu, S: jac_w(Rs0, ps0, m, n, mu, S))(
            f.win.n, f.win.mu, f.win.S)                 # (F,W,6,3,3),(F,W,6,3)

    dmu_t = dmn / N[:, None, None, None]                # (F, W, 6, 3)

    # ---- eigen-basis projections -------------------------------------
    # A[f,w,j,k] = u0^T dP uk / N
    A = jnp.einsum("fi,fwjil,flk->fwjk", u0, dP, U) / N[:, None, None, None]
    q = jnp.einsum("fi,fwji->fwj", u0, dmu_t)           # u0 . dmu_t
    ck = jnp.einsum("fwji,fik->fwjk", dmu_t, U)         # dmu_t . uk
    bk = jnp.einsum("fi,fik->fk", mu_t, U)              # mu_t . uk
    u0mu = bk[:, 0]                                     # u0 . mu_t
    # Q[f,w,j,k] = u0^T dC[w,j] uk
    Q = (A - q[..., None] * bk[:, None, None, :]
         - u0mu[:, None, None, None] * ck)

    grad = jnp.einsum("f,fwj->wj", wgt, Q[..., 0]).reshape(-1)

    # ---- eigen cross term: 2 Q_k diag(w/(lam0-lamk)) Q_k^T -----------
    gap = lam[:, 0:1] - lam[:, 1:3]                     # (F, 2) negative
    inv_gap = jnp.where(jnp.abs(gap) > 1e-9, 1.0 / gap, 0.0)
    Qk = Q[..., 1:3].reshape(F, W * 6, 2)
    H = 2.0 * jnp.einsum("fak,fbk->ab",
                         Qk * (wgt[:, None] * inv_gap)[:, None, :], Qk)

    # ---- global-mean rank-one term: -2 q q^T over ALL frame pairs ----
    q60 = q.reshape(F, W * 6)
    H = H - 2.0 * jnp.einsum("f,fa,fb->ab", wgt, q60, q60)

    # ---- within-frame second-order moment blocks ---------------------
    def hess_fw(u0f, Rw, pw, mw, n, mu, S):
        def scal(d):
            P, mn = _frame_moments(Rw, pw, n, mu, S, mw, d)
            return jnp.stack([u0f @ P @ u0f, u0f @ mn])
        return jax.hessian(scal)(z6)                    # (2, 6, 6)

    hess_w = jax.vmap(hess_fw, in_axes=(None, 0, 0, 0, 0, 0, 0))  # over W
    h2 = jax.vmap(
        lambda u0f, n, mu, S: hess_w(u0f, Rs0, ps0, m, n, mu, S))(
            u0, f.win.n, f.win.mu, f.win.S)             # (F, W, 2, 6, 6)
    blk = (h2[:, :, 0] - 2.0 * u0mu[:, None, None, None] * h2[:, :, 1]) \
        / N[:, None, None, None]
    blk = jnp.einsum("f,fwij->wij", wgt, blk)           # (W, 6, 6)
    wi = (jnp.arange(W)[:, None] * 6 + jnp.arange(6)[None, :])  # (W, 6)
    H = H.at[wi[:, :, None], wi[:, None, :]].add(blk)

    H = 0.5 * (H + H.T)
    return H, grad
