"""Distributed hierarchical global BA over a TPU mesh.

The reference's global mapping (`thd_globalmapping` + `HBA_add_edge`,
voxelslam.cpp:2822-3141 in the reference tree) runs windowed LiDAR-only
BAs over keyframes (10-window / 5-stride), extracts relative-pose edges
from each window Hessian, and solves a top-down pose graph. The windows
are embarrassingly parallel — the reference fans them over 2-5 CPU
threads; here they are sharded across the device mesh:

  * axis "win": HBA windows (data parallelism over the keyframe
    sequence — the "sequence parallel" axis of SURVEY.md section 5.7):
    each device runs `lm_lidar` on its shard of windows via vmap.
  * the reduced global pose system (6K x 6K over keyframe poses) is
    assembled with per-device partial scatter + `psum` over the mesh,
    then solved replicated (K is O(10^2-10^4) — tiny for the MXU).

This module is also the multi-chip dry-run surface: `gba_megastep` is
the "training step" jitted over the mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import so3
from ..ba import lidar_factor as lf
from ..ba import optimizers as opt


def window_ba_and_edges(factors: lf.FactorBatch, Rs, ps, max_iter: int = 2):
    """One HBA window: LiDAR-only LM + Hessian -> consecutive-frame edges.

    Returns (Rs', ps', rel_R (W-1,3,3), rel_p (W-1,3), info (W-1,6),
    resi). Mirrors HBA_add_edge's edge extraction (voxelslam.cpp:
    2926-2951): edge information from the Hessian diagonal blocks.
    """
    W = Rs.shape[0]
    win_mask = jnp.ones((W,))
    Rs2, ps2, H, r0, r1, conv = opt.lm_lidar(Rs, ps, factors, win_mask,
                                             max_iter=max_iter)
    rel_R = jnp.einsum("nji,njk->nik", Rs2[:-1], Rs2[1:])   # R_i^T R_{i+1}
    rel_p = jnp.einsum("nji,nj->ni", Rs2[:-1], ps2[1:] - ps2[:-1])
    # information per edge from the later frame's diagonal block
    diag = jnp.stack([jnp.diag(H)[6 * (i + 1):6 * (i + 2)]
                      for i in range(W - 1)])
    info = jnp.maximum(diag, 1e-6)
    return Rs2, ps2, rel_R, rel_p, info, r1


def _reduced_pose_system(kf_R, kf_p, starts, rel_R, rel_p, info, n_kf: int):
    """Gauss-Newton normal equations for the global keyframe pose graph
    from all windows' relative-pose edges.

    kf_R/kf_p: (K, ...) current keyframe poses (replicated);
    starts: (Nw,) first keyframe index of each window;
    rel_*/info: (Nw, W-1, ...) edges between consecutive keyframes.
    Returns (H (6K, 6K), g (6K,)) partial sums for this shard.
    """
    Nw, Wm1 = rel_R.shape[0], rel_R.shape[1]
    K = n_kf

    H = jnp.zeros((6 * K, 6 * K))
    g = jnp.zeros((6 * K,))

    def edge_residual(Ri, pi, Rj, pj, rR, rp):
        # between-factor: r = [Log(rR^T Ri^T Rj), Ri^T (pj - pi) - rp]
        dR = rR.T @ (Ri.T @ Rj)
        return jnp.concatenate([so3.log(dR), Ri.T @ (pj - pi) - rp])

    def per_edge(i_idx, j_idx, rR, rp, w6):
        Ri, pi = kf_R[i_idx], kf_p[i_idx]
        Rj, pj = kf_R[j_idx], kf_p[j_idx]

        def res(dxi, dxj):
            Ri2 = Ri @ so3.exp(dxi[0:3])
            pi2 = pi + dxi[3:6]
            Rj2 = Rj @ so3.exp(dxj[0:3])
            pj2 = pj + dxj[3:6]
            return edge_residual(Ri2, pi2, Rj2, pj2, rR, rp)

        z = jnp.zeros((6,))
        r = res(z, z)
        Ji, Jj = jax.jacfwd(res, argnums=(0, 1))(z, z)
        Jw_i = Ji * w6[:, None]
        Jw_j = Jj * w6[:, None]
        blocks = dict(
            Hii=Ji.T @ Jw_i, Hij=Ji.T @ Jw_j, Hjj=Jj.T @ Jw_j,
            gi=Ji.T @ (w6 * r), gj=Jj.T @ (w6 * r),
            chi=jnp.dot(r, w6 * r))
        return blocks

    # vmap over all edges in the shard
    i_idx = (starts[:, None] + jnp.arange(Wm1)[None, :]).reshape(-1)
    j_idx = i_idx + 1
    rR = rel_R.reshape(-1, 3, 3)
    rp = rel_p.reshape(-1, 3)
    w6 = info.reshape(-1, 6)
    blocks = jax.vmap(per_edge)(i_idx, j_idx, rR, rp, w6)

    # scatter-add into the global system
    def put(H, g, blocks):
        bi = i_idx * 6
        bj = j_idx * 6
        offs = jnp.arange(6)
        rows_i = bi[:, None] + offs[None, :]
        rows_j = bj[:, None] + offs[None, :]
        H = H.at[rows_i[:, :, None], rows_i[:, None, :]].add(blocks["Hii"])
        H = H.at[rows_i[:, :, None], rows_j[:, None, :]].add(blocks["Hij"])
        H = H.at[rows_j[:, :, None], rows_i[:, None, :]].add(
            jnp.swapaxes(blocks["Hij"], -1, -2))
        H = H.at[rows_j[:, :, None], rows_j[:, None, :]].add(blocks["Hjj"])
        g = g.at[rows_i].add(blocks["gi"])
        g = g.at[rows_j].add(blocks["gj"])
        return H, g

    H, g = put(H, g, blocks)
    return H, g, jnp.sum(blocks["chi"])


def make_gba_megastep(mesh: Mesh, n_kf: int, damping: float = 1e-3):
    """Build the jitted distributed GBA step over `mesh` (axis "win").

    Inputs (per call):
      factors: FactorBatch with leading (Nw,) window axis, sharded on "win"
      Rs, ps: (Nw, W, ...) window poses, sharded on "win"
      starts: (Nw,) first-keyframe index per window, sharded on "win"
      kf_R, kf_p: (K, ...) global keyframe poses, replicated
    Returns: updated (kf_R, kf_p), per-window residuals (sharded), chi2.
    """

    def local_shard(factors, Rs, ps, starts, kf_R, kf_p):
        # per-window BA on this shard (vmapped over local windows)
        Rs2, ps2, rel_R, rel_p, info, resi = jax.vmap(
            lambda f, R, p: window_ba_and_edges(f, R, p))(factors, Rs, ps)
        # partial global system + cross-shard reduction over "win"
        H, g, chi = _reduced_pose_system(kf_R, kf_p, starts, rel_R, rel_p,
                                         info, n_kf)
        H = jax.lax.psum(H, axis_name="win")
        g = jax.lax.psum(g, axis_name="win")
        chi = jax.lax.psum(chi, axis_name="win")
        # replicated damped GN solve on the reduced system (gauge: pin kf 0)
        H = H.at[:6, :].set(0.0).at[:, :6].set(0.0)
        H = H.at[:6, :6].set(jnp.eye(6))
        g = g.at[:6].set(0.0)
        D = jnp.diag(jnp.maximum(jnp.diag(H), 1e-8))
        dx = jnp.linalg.solve(H + damping * D, -g).reshape(n_kf, 6)
        kf_R2 = kf_R @ so3.exp(dx[:, 0:3])
        kf_p2 = kf_p + dx[:, 3:6]
        return kf_R2, kf_p2, resi, chi

    shard = jax.shard_map(
        local_shard, mesh=mesh,
        in_specs=(P("win"), P("win"), P("win"), P("win"), P(), P()),
        out_specs=(P(), P(), P("win"), P()),
        check_vma=False,
    )
    return jax.jit(shard)
