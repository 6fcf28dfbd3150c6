"""Distributed hierarchical global BA over a TPU mesh.

The reference's global mapping (`thd_globalmapping` + `HBA_add_edge`,
voxelslam.cpp:2822-3141 in the reference tree) runs windowed LiDAR-only
BAs over keyframes (10-window / 5-stride), extracts all-pairs
relative-pose edges from each window Hessian (:2926-2951), and solves a
top-down pose graph. The windows are embarrassingly parallel — the
reference fans them over 2-5 CPU threads; here they are sharded across
the device mesh:

  * axis "win": HBA windows (sequence/data parallelism over the keyframe
    stream, SURVEY.md section 5.7): each device runs the SAME
    convergence-driven coarse->fine window step the single-device
    `HbaRunner` uses (gba.hba._window_step), vmapped over its shard of
    windows. No collectives are needed during the window BAs; results
    (poses, all-pairs edges) stream back to the host, which feeds them
    into the top-down pose-graph solve (loop.posegraph, whose normal
    equations are assembled with one-hot matmul strips — MXU work, no
    element scatters).

`HbaRunner(mesh=...)` uses `make_window_fleet` as its production
bottom-up engine whenever a multi-device mesh is supplied; the sharded
and single-device paths run the identical jitted window step, so their
results agree exactly (tests/test_dist_gba.py).
"""

from __future__ import annotations

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def all_pairs_edges(Rs, ps, H, W: int):
    """All-pairs relative-pose edges from one optimized window
    (reference HBA_add_edge, voxelslam.cpp:2926-2951).

    Rs (W, 3, 3), ps (W, 3), H (6W, 6W). For every i < j:
    rel pose in frame i, per-axis variance v6 = 1/|H[6i+k, 6j+k]|;
    pairs with any |H_ij| < 1e-6 are masked invalid (the reference
    `continue`s). Returns (rel_R (Np,3,3), rel_p (Np,3), v6 (Np,6),
    valid (Np,)) with Np = W(W-1)/2 and static pair order.
    """
    ii, jj = np.triu_indices(W, 1)
    ii = jnp.array(ii, jnp.int32)
    jj = jnp.array(jj, jnp.int32)
    rel_R = jnp.einsum("nji,njk->nik", Rs[ii], Rs[jj])      # R_i^T R_j
    rel_p = jnp.einsum("nji,nj->ni", Rs[ii], ps[jj] - ps[ii])
    offs = jnp.arange(6)
    hij = jnp.abs(H[ii[:, None] * 6 + offs[None, :],
                    jj[:, None] * 6 + offs[None, :]])       # (Np, 6)
    valid = jnp.all(hij >= 1e-6, axis=-1)
    v6 = 1.0 / jnp.maximum(hij, 1e-6)
    return rel_R, rel_p, v6, valid


def condense_window(clouds, masks, Rs, ps, vs: float, P_out: int):
    """Merge an optimized window into first-frame coords and downsample
    (reference HBA_add_edge's submap merge, voxelslam.cpp:2954-2985).
    Device-side so the fleet emits finished submap clouds — the host
    only wraps them into Keyframe records."""
    from ..ops.downsample import voxel_downsample
    R0, p0 = Rs[0], ps[0]
    dR = jnp.einsum("ji,njk->nik", R0, Rs)              # R0^T R_n
    dp = jnp.einsum("ji,nj->ni", R0, ps - p0[None])
    moved = jnp.einsum("nij,npj->npi", dR, clouds) + dp[:, None]
    down, dmask, _ = voxel_downsample(moved.reshape(-1, 3),
                                      masks.reshape(-1), vs, P_out)
    return down, dmask.astype(jnp.float32)


def make_window_fleet(mesh: Mesh | None, window_step, W: int,
                      condense_vs: float | None = None,
                      point_max: int | None = None):
    """Build the jitted batched/sharded bottom-up GBA step.

    window_step: the single-window function from
    gba.hba.HbaRunner._window_step — (clouds (W,P,3), masks, Rs, ps,
    wmask) -> (Rs', ps', H, r0, r1).

    The returned callable takes batched inputs with a leading (Nw,)
    window axis and returns (Rs', ps', rel_R, rel_p, v6, evalid, r0, r1
    [, downs, dmasks]) with the edge arrays shaped (Nw, W(W-1)/2, ...)
    and — when condense_vs/point_max are given — the condensed submap
    clouds (Nw, point_max, 3) produced on device inside the same
    sharded call (no serial host downsample between fleet batches).
    With a mesh, Nw must be a multiple of the mesh size and the batch is
    sharded over axis "win" (shard_map of the vmapped step — each device
    runs its windows independently, zero collectives).
    """
    do_condense = condense_vs is not None

    def batch(clouds, masks, Rs, ps, wmask):
        Rs2, ps2, H, r0, r1 = jax.vmap(window_step)(clouds, masks, Rs,
                                                    ps, wmask)
        rel_R, rel_p, v6, evalid = jax.vmap(
            lambda r, p, h: all_pairs_edges(r, p, h, W))(Rs2, ps2, H)
        outs = (Rs2, ps2, rel_R, rel_p, v6, evalid, r0, r1)
        if do_condense:
            downs, dmasks = jax.vmap(
                lambda c, m, r, p: condense_window(
                    c, m, r, p, condense_vs, point_max))(
                clouds, masks * wmask[..., None], Rs2, ps2)
            outs = outs + (downs, dmasks)
        return outs

    n_out = 10 if do_condense else 8
    if mesh is None or mesh.size == 1:
        return jax.jit(batch)
    spec = (P("win"),) * 5
    out = (P("win"),) * n_out
    return jax.jit(jax.shard_map(batch, mesh=mesh, in_specs=spec,
                                 out_specs=out, check_vma=False))


# the mesh constructor lives in parallel.multihost (global_win_mesh),
# which also brings multi-host slices up via jax.distributed
