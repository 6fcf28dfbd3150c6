"""The point-cluster eigenvalue LiDAR BA factor (BALM2-style).

Capability parity with the reference `LidarFactor`
(voxel_map.hpp:124-339 in the reference tree): per harvested plane voxel,
the cost is

    coeff * lambda_0( Cov( fix + sum_i T_i . win_i ) )

— the smallest eigenvalue of the combined point covariance, whose
gradient/Hessian w.r.t. all window poses the reference assembles by hand
(acc_evaluate2). Here the cost is an explicit differentiable function of
the pose tangents through the centered-cluster transform algebra and the
custom-JVP 3x3 eigensolver, so

    gradient = jax.grad(cost)          (reverse mode, one pass)
    Hessian  = jax.jacfwd(jax.grad)    (exact second order, 6W passes)

batched over all factors at once — the same Newton system as the
reference's analytic blocks, produced by the compiler instead of
hand-derived cross terms.
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
    """Exact (6W, 6W) Hessian + (6W,) gradient of the eigen cost
    (the reference's acc_evaluate2 output, voxel_map.hpp:150-282)."""
    W = Rs0.shape[0]
    z = jnp.zeros((W * 6,), Rs0.dtype)

    def g(dflat):
        return jax.grad(
            lambda d: cost_at(f, Rs0, ps0, d.reshape(W, 6), win_mask))(dflat.reshape(W, 6)).reshape(-1)

    H = jax.jacfwd(g)(z)
    J = g(z)
    H = 0.5 * (H + H.T)
    return H, J
