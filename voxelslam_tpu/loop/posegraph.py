"""SE(3) pose-graph optimizer (BetweenFactor Gauss-Newton).

Replaces the reference's GTSAM/ISAM2 usage (voxelslam.cpp:2552-2561,
2769-2777 in the reference tree). The reference only ever solves
batch-style bursts of BetweenFactor graphs (odometry chains + loop
edges + a prior on the first pose), at most O(10^4) poses — a dense
damped GN on TPU handles that directly; ISAM2 incrementality is not
needed (SURVEY.md section 7.3).

Edges are (i, j, rel_R, rel_p, info6) with the residual
    r = [Log(rel_R^T R_i^T R_j), R_i^T (p_j - p_i) - rel_p]
and diagonal information info6 (the reference feeds per-edge variances
v6 from the local-BA Hessian, loop_refine.hpp:17-45).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import so3


def edge_residual(Ri, pi, Rj, pj, rel_R, rel_p):
    dR = rel_R.T @ (Ri.T @ Rj)
    return jnp.concatenate([so3.log(dR),
                            Ri.T @ (pj - pi) - rel_p])


def _edge_blocks(R, p, i_idx, j_idx, rel_R, rel_p, info):
    """Batched residual/Jacobian blocks for all edges."""

    def one(i, j, rR, rp, w6):
        Ri, pi = R[i], p[i]
        Rj, pj = R[j], p[j]

        def res(dxi, dxj):
            return edge_residual(Ri @ so3.exp(dxi[0:3]), pi + dxi[3:6],
                                 Rj @ so3.exp(dxj[0:3]), pj + dxj[3:6],
                                 rR, rp)

        z = jnp.zeros((6,))
        r = res(z, z)
        Ji, Jj = jax.jacfwd(res, argnums=(0, 1))(z, z)
        return r, Ji, Jj

    return jax.vmap(one)(i_idx, j_idx, rel_R, rel_p, info)


def assemble_pose_system(i_idx, j_idx, r, Ji, Jj, w6, K: int,
                         chunk: int = 512):
    """Gauss-Newton normal equations H = A^T W A, g = A^T W r for a
    between-factor graph, assembled WITHOUT element scatters.

    Computed 2D-index scatter-adds serialize on TPU (~0.2 us/element);
    instead each edge's 6x6 Jacobian blocks are lifted into a (6, 6K)
    row strip via one-hot matmuls and reduced with ONE einsum per chunk
    — pure MXU work. Edges are processed in `chunk`-sized slices inside
    a lax.scan so the (chunk, 6, 6K) strip stays bounded.

    i_idx/j_idx: (E,) int32; r: (E, 6); Ji/Jj: (E, 6, 6);
    w6: (E, 6) per-residual-row weights (zero rows = dead edges).
    Returns (H (6K, 6K), g (6K,), chi2).
    """
    E = i_idx.shape[0]
    n = 6 * K
    chunk = min(chunk, E) or 1
    pad = (-E) % chunk
    dt = Ji.dtype
    if pad:
        zi = jnp.zeros((pad,), i_idx.dtype)
        i_idx = jnp.concatenate([i_idx, zi])
        j_idx = jnp.concatenate([j_idx, zi])
        r = jnp.concatenate([r, jnp.zeros((pad, 6), dt)])
        Ji = jnp.concatenate([Ji, jnp.zeros((pad, 6, 6), dt)])
        Jj = jnp.concatenate([Jj, jnp.zeros((pad, 6, 6), dt)])
        w6 = jnp.concatenate([w6, jnp.zeros((pad, 6), dt)])
    nc = (E + pad) // chunk
    ch = lambda a: a.reshape((nc, chunk) + a.shape[1:])

    def body(c, args):
        H, g = c
        ii, jj, rr, JI, JJ, ww = args
        O_i = jax.nn.one_hot(ii, K, dtype=dt)              # (c, K)
        O_j = jax.nn.one_hot(jj, K, dtype=dt)
        A = (jnp.einsum("ek,erb->erkb", O_i, JI)
             + jnp.einsum("ek,erb->erkb", O_j, JJ)).reshape(-1, 6, n)
        Aw = A * ww[:, :, None]
        H = H + jnp.einsum("erm,ern->mn", Aw, A)
        g = g + jnp.einsum("erm,er->m", Aw, rr)
        return (H, g), None

    (H, g), _ = jax.lax.scan(
        body, (jnp.zeros((n, n), dt), jnp.zeros((n,), dt)),
        (ch(i_idx), ch(j_idx), ch(r), ch(Ji), ch(Jj), ch(w6)))
    chi = jnp.sum(w6 * r * r)
    return H, g, chi


def solve_pose_graph(R, p, i_idx, j_idx, rel_R, rel_p, info,
                     edge_mask=None, iters: int = 5, damping: float = 1e-6,
                     fix_first: bool = True):
    """Damped GN over all poses. R (K,3,3), p (K,3); edges as arrays.

    info: (E, 6) diagonal information per edge. Returns (R, p, chi2).
    """
    K = R.shape[0]
    if edge_mask is None:
        edge_mask = jnp.ones(i_idx.shape[0], bool)
    w_edge = edge_mask.astype(jnp.float32)

    def gn_iter(carry, _):
        R, p = carry
        r, Ji, Jj = _edge_blocks(R, p, i_idx, j_idx, rel_R, rel_p, info)
        w6 = info * w_edge[:, None]
        H, g, chi = assemble_pose_system(i_idx, j_idx, r, Ji, Jj, w6, K)

        if fix_first:
            H = H.at[:6, :].set(0.0).at[:, :6].set(0.0)
            H = H.at[:6, :6].set(jnp.eye(6))
            g = g.at[:6].set(0.0)
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
        Hs = H / d[:, None] / d[None, :]
        Hs = Hs + damping * jnp.eye(6 * K)
        dx = (jnp.linalg.solve(Hs, -(g / d)) / d).reshape(K, 6)
        R2 = R @ so3.exp(dx[:, 0:3])
        p2 = p + dx[:, 3:6]
        return (R2, p2), chi

    (R, p), chis = jax.lax.scan(gn_iter, (R, p), None, length=iters)
    return R, p, chis[-1]


def assemble_pose_system_full(i_idx, j_idx, r, Ji, Jj, W6, K: int,
                              chunk: int = 512):
    """assemble_pose_system with FULL 6x6 per-edge information matrices
    (condensed chain segments carry adjoint-propagated covariances whose
    inverse is not diagonal — loop/condense.py). Same one-hot matmul
    strip assembly; the row weighting becomes a 6x6 matmul per edge.

    W6: (E, 6, 6) symmetric PSD information (zero matrix = dead edge).
    Returns (H (6K, 6K), g (6K,), chi2)."""
    E = i_idx.shape[0]
    n = 6 * K
    chunk = min(chunk, E) or 1
    pad = (-E) % chunk
    dt = Ji.dtype
    if pad:
        zi = jnp.zeros((pad,), i_idx.dtype)
        i_idx = jnp.concatenate([i_idx, zi])
        j_idx = jnp.concatenate([j_idx, zi])
        r = jnp.concatenate([r, jnp.zeros((pad, 6), dt)])
        Ji = jnp.concatenate([Ji, jnp.zeros((pad, 6, 6), dt)])
        Jj = jnp.concatenate([Jj, jnp.zeros((pad, 6, 6), dt)])
        W6 = jnp.concatenate([W6, jnp.zeros((pad, 6, 6), dt)])
    nc = (E + pad) // chunk
    ch = lambda a: a.reshape((nc, chunk) + a.shape[1:])

    def body(c, args):
        H, g = c
        ii, jj, rr, JI, JJ, WW = args
        O_i = jax.nn.one_hot(ii, K, dtype=dt)
        O_j = jax.nn.one_hot(jj, K, dtype=dt)
        A = (jnp.einsum("ek,erb->erkb", O_i, JI)
             + jnp.einsum("ek,erb->erkb", O_j, JJ)).reshape(-1, 6, n)
        Aw = jnp.einsum("ers,esm->erm", WW, A)
        H = H + jnp.einsum("erm,ern->mn", Aw, A)
        g = g + jnp.einsum("erm,er->m", Aw, rr)
        return (H, g), None

    (H, g), _ = jax.lax.scan(
        body, (jnp.zeros((n, n), dt), jnp.zeros((n,), dt)),
        (ch(i_idx), ch(j_idx), ch(r), ch(Ji), ch(Jj), ch(W6)))
    chi = jnp.einsum("er,ers,es->", r, W6, r)
    return H, g, chi


def solve_pose_graph_full(R, p, i_idx, j_idx, rel_R, rel_p, W6,
                          iters: int = 5, damping: float = 1e-6,
                          fix_first: bool = True):
    """Damped GN with full 6x6 per-edge information (the anchor-graph
    solve of the condensed backend). Dead/padded edges: W6 = 0; padded
    poses (no live edges) stay fixed (zero gradient + damping)."""
    K = R.shape[0]

    def gn_iter(carry, _):
        R, p = carry
        r, Ji, Jj = _edge_blocks(R, p, i_idx, j_idx, rel_R, rel_p,
                                 W6[:, :, 0])
        H, g, chi = assemble_pose_system_full(i_idx, j_idx, r, Ji, Jj,
                                              W6, K)
        if fix_first:
            H = H.at[:6, :].set(0.0).at[:, :6].set(0.0)
            H = H.at[:6, :6].set(jnp.eye(6))
            g = g.at[:6].set(0.0)
        d = jnp.sqrt(jnp.maximum(jnp.diag(H), 1e-10))
        Hs = H / d[:, None] / d[None, :]
        Hs = Hs + damping * jnp.eye(6 * K)
        dx = (jnp.linalg.solve(Hs, -(g / d)) / d).reshape(K, 6)
        R2 = R @ so3.exp(dx[:, 0:3])
        p2 = p + dx[:, 3:6]
        return (R2, p2), chi

    (R, p), chis = jax.lax.scan(gn_iter, (R, p), None, length=iters)
    return R, p, chis[-1]


def odometry_chain_edges(Rs, ps, v6):
    """Consecutive BetweenFactors from a trajectory (the reference's
    odometry chain in build_graph, voxelslam.cpp:2078-2154).

    v6: (K, 6) per-scan variance -> info = 1/var on the edge to its
    successor. Returns (i_idx, j_idx, rel_R, rel_p, info).
    """
    K = Rs.shape[0]
    i_idx = jnp.arange(K - 1, dtype=jnp.int32)
    j_idx = i_idx + 1
    rel_R = jnp.einsum("nji,njk->nik", Rs[:-1], Rs[1:])
    rel_p = jnp.einsum("nji,nj->ni", Rs[:-1], ps[1:] - ps[:-1])
    info = 1.0 / jnp.maximum(v6[1:], 1e-8)
    return i_idx, j_idx, rel_R, rel_p, info
