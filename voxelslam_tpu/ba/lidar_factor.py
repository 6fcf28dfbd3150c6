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


def hess_grad_ct(f: FactorBatch, Rs0, ps0, win_mask):
    """Exact (6W, 6W) Hessian + (6W,) gradient of the eigen cost via
    fully CLOSED-FORM eigen-perturbation assembly (no autodiff at all —
    the reference's hand-derived acc_evaluate2, voxel_map.hpp:150-282,
    re-derived for the centered-cluster layout).

    Identical math to `hess_grad_analytic`, but every moment Jacobian /
    per-frame Hessian block that version obtains with jacfwd/jax.hessian
    is written out in closed form, and every output-sized contraction is
    arranged as a sum over the factor axis ("f...,f...->..." einsums =
    (out, F)@(F, out) matmuls). Intermediates stay at (F, W, 3[,3]) —
    the (F, W, 6, 3, 3) tangent batches that made the jacfwd versions
    HBM-bound never exist.

    Derivation sketch (right perturbation d=[w, t] of frame pose (R, p),
    local cluster (n, mu, S), a = R^T u0, b_k = R^T u_k, mw = R mu + p):

      d(R S R^T)[e_j]  = R (e_j^ S + S e_j^T) R^T
        => u0^T (.) u_k = e_j . [ (S b_k) x a + (S a) x b_k ]
      d(mw)[rot e_j] = R (e_j x mu)  =>  u0 . d(mw) = e_j . (mu x a)
      d(mw)[tra e_j] = e_j
      second order (y(w) = exp(-w^)a, s(d) = y.mu + u0.(p + t)):
        y'_j = a^ e_j,  y''_jk mu = sym_jk(mu_k a_j) - (mu.a) d_jk
        H(y^T S y) = 2[ a^T S^a^ ... ] -- assembled below as
          2(-a^ S a^) + (Sa a^T + a Sa^T) - 2(a.Sa) I
        H(n s^2) = 2n (s' s'^T + s s''),  s'_w = mu x a, s'_t = u0
    """
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

    n_l = f.win.n                                       # (F, W)
    mu_l = f.win.mu                                     # (F, W, 3)
    S_l = f.win.S                                       # (F, W, 3, 3)

    # rotated eigenvectors b[f,w,i,k] = (R_w^T u_k)_i  (b[...,0] = a)
    b = jnp.einsum("wji,fjk->fwik", Rs0, U)
    a = b[..., 0]                                       # (F, W, 3)
    Sb = jnp.einsum("fwil,fwlk->fwik", S_l, b)          # (F, W, 3, 3)
    Sa = Sb[..., 0]

    # mw . u_k  (world-frame mean dotted with each eigenvector)
    mwk = (jnp.einsum("fwi,fwik->fwk", mu_l, b)
           + jnp.einsum("wi,fik->fwk", ps0, U))         # (F, W, 3)
    u0mw = mwk[..., 0]
    u0mu = jnp.einsum("fi,fi->f", mu_t, u0)             # u0 . mu_t
    bk = jnp.einsum("fi,fik->fk", mu_t, U)              # mu_t . u_k

    # --- first-order projections Q[f,w,j,k] = u0^T dC[w,j] u_k --------
    cxa = jnp.cross(mu_l, a)                            # mu x a  (F,W,3)
    cxb = jnp.cross(mu_l[..., None, :],
                    jnp.moveaxis(b, -1, -2))            # (F, W, 3[k], 3[j])
    cxb = jnp.moveaxis(cxb, -1, -2)                     # (F, W, 3[j], 3[k])
    rotS = (jnp.cross(jnp.moveaxis(Sb, -1, -2), a[..., None, :])
            + jnp.cross(Sa[..., None, :], jnp.moveaxis(b, -1, -2)))
    rotS = jnp.moveaxis(rotS, -2, -1)                   # (F, W, 3[j], 3[k])

    nm = n_l * m[None, :]                               # (F, W)
    invN = (1.0 / N)[:, None]                           # (F, 1)
    # A = u0^T dP u_k / N : rotation rows then translation rows
    A_rot = (m[None, :, None, None] * rotS
             + nm[..., None, None] * (cxa[..., :, None] * mwk[..., None, :]
                                      + u0mw[..., None, None] * cxb)
             ) * invN[..., None, None]
    A_tr = (nm[..., None, None]
            * (u0[:, None, :, None] * mwk[..., None, :]
               + u0mw[..., None, None] * U[:, None])
            ) * invN[..., None, None]                   # (F, W, 3, 3)

    # q[f,w,j] = u0 . dmu_t ; ck[f,w,j,k] = dmu_t . u_k
    q_rot = nm[..., None] * cxa * invN[..., None]
    q_tr = nm[..., None] * u0[:, None] * invN[..., None]
    ck_rot = nm[..., None, None] * cxb * invN[..., None, None]
    ck_tr = nm[..., None, None] * U[:, None] * invN[..., None, None]

    q = jnp.concatenate([q_rot, q_tr], axis=2)          # (F, W, 6)
    A6 = jnp.concatenate([A_rot, A_tr], axis=2)         # (F, W, 6, 3)
    ck6 = jnp.concatenate([ck_rot, ck_tr], axis=2)
    Q = (A6 - q[..., None] * bk[:, None, None, :]
         - u0mu[:, None, None, None] * ck6)             # (F, W, 6, 3)

    grad = jnp.einsum("f,fwj->wj", wgt, Q[..., 0]).reshape(-1)

    # --- eigen cross term: 2 Qk diag(w/(lam0-lamk)) Qk^T --------------
    gap = lam[:, 0:1] - lam[:, 1:3]                     # (F, 2) negative
    inv_gap = jnp.where(jnp.abs(gap) > 1e-9, 1.0 / gap, 0.0)
    Qk = Q[..., 1:3].reshape(F, W * 6, 2)
    H = 2.0 * jnp.einsum("fak,fbk->ab",
                         Qk * (wgt[:, None] * inv_gap)[:, None, :], Qk)

    # --- global-mean rank-one term: -2 q q^T over ALL frame pairs -----
    q60 = q.reshape(F, W * 6)
    H = H - 2.0 * jnp.einsum("f,fa,fb->ab", wgt, q60, q60)

    # --- within-frame 6x6 diagonal blocks (closed form) ---------------
    alpha = wgt[:, None] / N[:, None] * m[None, :]      # (F, W)
    aSa = jnp.einsum("fwi,fwi->fw", a, Sa)
    mua = jnp.einsum("fwi,fwi->fw", mu_l, a)
    hat_a = jnp.cross(
        a[..., None, :],
        jnp.broadcast_to(jnp.eye(3, dtype=dtype), a.shape[:-1] + (3, 3)),
        axis=-1)                                        # hat(a)[f,w,i,j]
    aSaH = jnp.einsum("fwij,fwjl,fwlk->fwik", hat_a, S_l, hat_a)

    # coefficient bundles (all reduce over f with weight alpha)
    s0 = u0mw                                           # s at d=0
    coef_ss = 2.0 * nm * (s0 - u0mu[:, None])           # s'' scale
    I3 = jnp.eye(3, dtype=dtype)

    def red(c, x, y):
        """sum_f alpha*c [f,w] * x[f,w,i] y[f,w,j] -> (W, 3, 3)."""
        return jnp.einsum("fw,fwi,fwj->wij", alpha * c, x, y)

    one = jnp.ones_like(aSa)
    # H(term1) = -2 a^S a^ + (Sa a^T + a Sa^T) - 2(a.Sa) I
    blk_ww = (-2.0 * jnp.einsum("fw,fwik->wik", alpha, aSaH)
              + red(one, Sa, a) + red(one, a, Sa)
              - 2.0 * jnp.einsum("fw,fw->w", alpha, aSa)[:, None, None] * I3
              # 2 n s' s'^T  (omega-omega part)
              + 2.0 * red(nm, cxa, cxa)
              # (2 n s - 2 n u0mu) s''_ww ; s'' = sym(mu a^T) - (mu.a) I
              + 0.5 * (red(coef_ss, mu_l, a) + red(coef_ss, a, mu_l))
              - jnp.einsum("fw,fw->w", alpha * coef_ss, mua)[:, None, None]
              * I3)
    blk_wt = 2.0 * jnp.einsum("fw,fwi,fj->wij", alpha * nm, cxa, u0)
    blk_tt = 2.0 * jnp.einsum("fw,fi,fj->wij", alpha * nm, u0, u0)

    blk = jnp.concatenate([
        jnp.concatenate([blk_ww, blk_wt], axis=-1),
        jnp.concatenate([jnp.swapaxes(blk_wt, -1, -2), blk_tt], axis=-1),
    ], axis=-2)                                         # (W, 6, 6)
    # scatter-free block-diagonal add (2D-index element scatters run
    # serially on TPU): eye-masked broadcast + reshape stays fused
    H = H + jnp.einsum("ij,iab->iajb", jnp.eye(W, dtype=H.dtype),
                       blk).reshape(W * 6, W * 6)

    H = 0.5 * (H + H.T)
    return H, grad


def transpose_factors(f: FactorBatch):
    """FactorBatch (F, W, ...) -> factor-minor arrays for the _t kernels.

    Returns (n_l (W,F), mu_l (W,3,F), S_l (W,3,3,F), fix_n (F,),
    fix_mu (3,F), fix_S (3,3,F), wgt_base (F,)). One relayout copy per
    array, hoisted out of the LM loop by the caller."""
    n_l = f.win.n.T
    mu_l = jnp.transpose(f.win.mu, (1, 2, 0))
    S_l = jnp.transpose(f.win.S, (1, 2, 3, 0))
    fix_mu = f.fix.mu.T
    fix_S = jnp.transpose(f.fix.S, (1, 2, 0))
    wgt_base = (f.coeff * f.valid).astype(f.win.mu.dtype)
    return n_l, mu_l, S_l, f.fix.n, fix_mu, fix_S, wgt_base


def _rot_t(R, v):
    """(W,3,3) @ (W,3,F) -> (W,3,F), hand-unrolled over the size-3
    contraction: a dot_general here makes XLA transpose the factor-minor
    operand to factor-major (measured ~2.5 ms/scan of relayout copies at
    full matmul precision); 3 broadcast mult-adds stay one fused VPU
    pass in true f32."""
    return sum(R[:, :, j, None] * v[:, None, j] for j in range(3))


def _rot_mat_t(R, S):
    """(W,3,3) @ (W,3,3,F) @ (W,3,3)^T -> (W,3,3,F), unrolled (see
    _rot_t)."""
    e = sum(R[:, :, j, None, None] * S[:, None, j] for j in range(3))
    return sum(e[:, :, None, k, :] * R[:, None, :, k, None]
               for k in range(3))


def _total_clusters_t(ft, Rs, ps, win_mask):
    """total_clusters with factor-minor layouts. Returns
    (n_t (F,), mu_t (3,F), S_t (3,3,F)). All intermediates keep the
    factor axis LAST (TPU lanes) — the (F, W, 3, 3) layouts of the
    F-major version tile-pad their trailing size-3 dims to 128 lanes and
    relayout-copy before every MXU contraction."""
    n_l, mu_l, S_l, fix_n, fix_mu, fix_S, _ = ft
    m = win_mask
    n_w = n_l * m[:, None]                                   # (W, F)
    # mu_w[w,i,f] = R[w,i,j] mu_l[w,j,f] + p[w,i]
    mu_w = _rot_t(Rs, mu_l) + ps[:, :, None]
    # S_w[w,i,l,f] = R S R^T
    S_w = _rot_mat_t(Rs, S_l)

    n_t = fix_n + jnp.sum(n_w, axis=0)                       # (F,)
    inv_n = 1.0 / jnp.maximum(n_t, 1.0)
    mu_t = (fix_n[None] * fix_mu
            + jnp.einsum("wf,wif->if", n_w, mu_w)) * inv_n[None]
    d_w = mu_w - mu_t[None]                                  # (W, 3, F)
    d_f = fix_mu - mu_t
    S_t = (fix_S
           + fix_n[None, None] * (d_f[:, None] * d_f[None])
           + jnp.einsum("wilf,w->ilf", S_w, m)
           + jnp.einsum("wf,wif,wjf->ijf", n_w, d_w, d_w))
    empty = (n_t == 0)[None]
    mu_t = jnp.where(empty, 0.0, mu_t)
    S_t = jnp.where(empty[None], 0.0, S_t)
    return n_t, mu_t, S_t


def _eig_t(n_t, mu_t, S_t):
    """Eigendecomposition of the covariances: (lam (F,3), U (3,3,F)).

    The (F, 3, 3) transposes are tiny (F x 9 floats); eigh3's closed form
    stays in its natural batch layout."""
    inv_n = 1.0 / jnp.maximum(n_t, 1.0)
    # centered convention: cov = S/n (S is already the scatter about mu)
    cov = S_t * inv_n[None, None]
    lam, U = eigh3(jnp.transpose(cov, (2, 0, 1)))
    return lam, jnp.transpose(U, (1, 2, 0))


def cost_t(ft, Rs, ps, win_mask):
    """Eigen-factor residual sum via the factor-minor path."""
    n_t, mu_t, S_t = _total_clusters_t(ft, Rs, ps, win_mask)
    lam, _ = _eig_t(n_t, mu_t, S_t)
    wgt = ft[6] * (n_t > 0)
    return jnp.sum(wgt * lam[:, 0])


def _cross_t(x, y, axis):
    return jnp.cross(x, y, axisa=axis, axisb=axis, axisc=axis)


def hess_grad_ct_t(ft, Rs0, ps0, win_mask):
    """`hess_grad_ct` re-arranged with the factor axis LAST everywhere
    (see transpose_factors). Identical math — verified to machine
    precision against hess_grad_ct — but every (W, ..., F) intermediate
    keeps F on the TPU lane dimension, and every output-sized reduction
    is a (60, F)-by-(F, 60) MXU matmul. Returns (H (6W,6W), g (6W,)).
    """
    n_l, mu_l, S_l, fix_n, fix_mu, fix_S, wgt_base = ft
    W = Rs0.shape[0]
    F = n_l.shape[1]
    dtype = Rs0.dtype
    m = win_mask.astype(dtype)

    n_t, mu_t, S_t = _total_clusters_t(ft, Rs0, ps0, win_mask)
    N = jnp.maximum(n_t, 1.0)                           # (F,)
    lam, U = _eig_t(n_t, mu_t, S_t)                     # (F,3), (3,3,F)
    u0 = U[:, 0]                                        # (3, F)
    wgt = wgt_base * (n_t > 0)                          # (F,)

    # rotated eigenvectors b[w,i,k,f] = (R_w^T u_k)_i  (b[:, :, 0] = a).
    # All size-3 contractions below are hand-unrolled broadcast
    # mult-adds: as dot_generals at full matmul precision XLA transposes
    # the factor-minor (W,3,3,F) operands to factor-major and back
    # (~2.5 ms/scan of relayout copies inside the LM loop).
    b = sum(Rs0[:, j, :, None, None] * U[j][None, None]
            for j in range(3))                          # (W, 3, 3, F)
    a = b[:, :, 0]                                      # (W, 3, F)
    Sb = sum(S_l[:, :, l, None, :] * b[:, None, l]
             for l in range(3))                         # (W, 3, 3, F)
    Sa = Sb[:, :, 0]

    # mw . u_k  (world-frame mean dotted with each eigenvector)
    mwk = (sum(mu_l[:, i, None] * b[:, i] for i in range(3))
           + sum(ps0[:, i, None, None] * U[i][None]
                 for i in range(3)))                    # (W, 3, F)
    u0mw = mwk[:, 0]                                    # (W, F)
    u0mu = jnp.einsum("if,if->f", mu_t, u0)             # (F,)
    bk = jnp.einsum("if,ikf->kf", mu_t, U)              # (3, F)

    # --- first-order projections Q[w,j,k,f] = u0^T dC[w,j] u_k --------
    cxa = _cross_t(mu_l, a, 1)                          # mu x a  (W, 3, F)
    cxb = _cross_t(mu_l[:, :, None], b, 1)              # (W, 3[j], 3[k], F)
    rotS = (_cross_t(Sb, a[:, :, None], 1)
            + _cross_t(Sa[:, :, None], b, 1))           # (W, 3[j], 3[k], F)

    nm = n_l * m[:, None]                               # (W, F)
    invN = (1.0 / N)[None]                              # (1, F)
    A_rot = (m[:, None, None, None] * rotS
             + nm[:, None, None] * (cxa[:, :, None] * mwk[:, None]
                                    + u0mw[:, None, None] * cxb)
             ) * invN[:, None, None]
    A_tr = (nm[:, None, None]
            * (u0[None, :, None] * mwk[:, None]
               + u0mw[:, None, None] * U[None])
            ) * invN[:, None, None]                     # (W, 3, 3, F)

    q_rot = nm[:, None] * cxa * invN[:, None]           # (W, 3, F)
    q_tr = nm[:, None] * u0[None] * invN[:, None]
    ck_rot = nm[:, None, None] * cxb * invN[:, None, None]
    ck_tr = nm[:, None, None] * U[None] * invN[:, None, None]

    q = jnp.concatenate([q_rot, q_tr], axis=1)          # (W, 6, F)
    A6 = jnp.concatenate([A_rot, A_tr], axis=1)         # (W, 6, 3, F)
    ck6 = jnp.concatenate([ck_rot, ck_tr], axis=1)
    Q = (A6 - q[:, :, None] * bk[None, None]
         - u0mu[None, None, None] * ck6)                # (W, 6, 3, F)

    grad = jnp.einsum("f,wjf->wj", wgt, Q[:, :, 0]).reshape(-1)

    # --- eigen cross term: 2 Qk diag(w/(lam0-lamk)) Qk^T --------------
    gap = lam[:, 0:1] - lam[:, 1:3]                     # (F, 2) negative
    inv_gap = jnp.where(jnp.abs(gap) > 1e-9, 1.0 / gap, 0.0)
    s2 = (wgt[:, None] * inv_gap).T                     # (2, F)
    Qk = Q[:, :, 1:3].reshape(W * 6, 2, F)
    A2 = (Qk * s2[None]).reshape(W * 6, 2 * F)
    B2 = Qk.reshape(W * 6, 2 * F)
    H = 2.0 * (A2 @ B2.T)

    # --- global-mean rank-one term: -2 q q^T over ALL frame pairs -----
    q60 = q.reshape(W * 6, F)
    H = H - 2.0 * ((q60 * wgt[None]) @ q60.T)

    # --- within-frame 6x6 diagonal blocks (closed form) ---------------
    alpha = (wgt / N)[None] * m[:, None]                # (W, F)
    aSa = jnp.einsum("wif,wif->wf", a, Sa)
    mua = jnp.einsum("wif,wif->wf", mu_l, a)
    # hat(a) S hat(a): left cross over rows, right cross over columns
    hs = _cross_t(a[:, :, None], S_l, 1)                # (hat(a) S)[w,i,l,f]
    aSaH = _cross_t(hs, jnp.broadcast_to(a[:, None], hs.shape), 2)

    s0 = u0mw
    coef_ss = 2.0 * nm * (s0 - u0mu[None])
    I3 = jnp.eye(3, dtype=dtype)

    def red(c, x, y):
        """sum_f alpha*c [w,f] * x[w,i,f] y[w,j,f] -> (W, 3, 3)."""
        return jnp.einsum("wf,wif,wjf->wij", alpha * c, x, y)

    one = jnp.ones_like(aSa)
    blk_ww = (-2.0 * jnp.einsum("wf,wikf->wik", alpha, aSaH)
              + red(one, Sa, a) + red(one, a, Sa)
              - 2.0 * jnp.einsum("wf,wf->w", alpha, aSa)[:, None, None] * I3
              + 2.0 * red(nm, cxa, cxa)
              + 0.5 * (red(coef_ss, mu_l, a) + red(coef_ss, a, mu_l))
              - jnp.einsum("wf,wf->w", alpha * coef_ss, mua)[:, None, None]
              * I3)
    blk_wt = 2.0 * jnp.einsum("wf,wif,jf->wij", alpha * nm, cxa, u0)
    blk_tt = 2.0 * jnp.einsum("wf,if,jf->wij", alpha * nm, u0, u0)

    blk = jnp.concatenate([
        jnp.concatenate([blk_ww, blk_wt], axis=-1),
        jnp.concatenate([jnp.swapaxes(blk_wt, -1, -2), blk_tt], axis=-1),
    ], axis=-2)                                         # (W, 6, 6)
    # scatter-free block-diagonal add (2D-index element scatters run
    # serially on TPU): eye-masked broadcast + reshape stays fused
    H = H + jnp.einsum("ij,iab->iajb", jnp.eye(W, dtype=H.dtype),
                       blk).reshape(W * 6, W * 6)

    H = 0.5 * (H + H.T)
    return H, grad


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
    # scatter-free block-diagonal add (2D-index element scatters run
    # serially on TPU): eye-masked broadcast + reshape stays fused
    H = H + jnp.einsum("ij,iab->iajb", jnp.eye(W, dtype=H.dtype),
                       blk).reshape(W * 6, W * 6)

    H = 0.5 * (H + H.T)
    return H, grad
