"""Fixed-capacity voxel-grid downsampling (centroid average).

Replaces the reference's hash-map downsamplers (down_sampling_voxel,
tools.hpp:201-238; down_sampling_pvec, voxel_map.hpp:39-81) with a
dedup + segment-mean that keeps static shapes: output is padded to
`out_max` rows with a validity mask.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import voxel_hash as vh


def voxel_downsample(points: jnp.ndarray, mask: jnp.ndarray,
                     voxel_size: float, out_max: int):
    """Centroid-average points per voxel.

    points: (N, 3); mask: (N,). Returns (out (out_max, 3), out_mask,
    counts (out_max,)).
    """
    keys = vh.voxel_key(points, voxel_size)
    uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, out_max)
    U = out_max
    # barrier: seg (indices) and w (updates) share the `inv >= 0`
    # producer; fusing it into two operands of one scatter trips an
    # XLA:TPU fusion assertion (scatter_emitter.cc)
    seg, w = jax.lax.optimization_barrier(
        (jnp.where(inv >= 0, inv, U),
         ((mask > 0) & (inv >= 0)).astype(points.dtype)))
    n = jnp.zeros((U,)).at[seg].add(w, mode="drop")
    s = jnp.zeros((U, 3)).at[seg].add(points * w[:, None], mode="drop")
    out = s / jnp.maximum(n, 1.0)[:, None]
    return out, uvalid & (n > 0), n


def voxel_downsample_close(points: jnp.ndarray, mask: jnp.ndarray,
                           voxel_size: float, out_max: int):
    """Keep the REAL point closest to each voxel's centroid (reference
    down_sampling_close, tools.hpp:240-302 — used where interpolated
    centroids would invent points, e.g. keyframe clouds).

    Returns (out (out_max, 3), out_mask, src_idx (out_max,) int32 index
    into `points` of each kept row, -1 where empty).
    """
    N = points.shape[0]
    keys = vh.voxel_key(points, voxel_size)
    uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, out_max)
    U = out_max
    seg, w = jax.lax.optimization_barrier(
        (jnp.where(inv >= 0, inv, U),
         ((mask > 0) & (inv >= 0)).astype(points.dtype)))
    n = jnp.zeros((U,)).at[seg].add(w, mode="drop")
    s = jnp.zeros((U, 3)).at[seg].add(points * w[:, None], mode="drop")
    cen = s / jnp.maximum(n, 1.0)[:, None]

    # elect argmin ||p - centroid|| per voxel in two scatter-min passes:
    # (1) min distance per segment, (2) min point index among the rows
    # attaining it (deterministic tie-break)
    d2 = jnp.sum((points - cen[jnp.minimum(seg, U - 1)]) ** 2, axis=-1)
    inf = jnp.float32(3.4e38)
    e_idx, e_upd = jax.lax.optimization_barrier(
        (seg, jnp.where(w > 0, d2, inf)))
    dmin = jnp.full((U,), inf).at[e_idx].min(e_upd, mode="drop")
    at_min = (w > 0) & (d2 <= dmin[jnp.minimum(seg, U - 1)])
    big = jnp.int32(2147483647)
    i_idx, i_upd = jax.lax.optimization_barrier(
        (jnp.where(at_min, seg, U),
         jnp.where(at_min, jnp.arange(N, dtype=jnp.int32), big)))
    src = jnp.full((U,), big, jnp.int32).at[i_idx].min(i_upd, mode="drop")
    src = jnp.where(src < big, src, -1)
    out = points[jnp.maximum(src, 0)]
    valid = uvalid & (src >= 0)
    out = jnp.where(valid[:, None], out, 0.0)
    return out, valid, src


def voxel_downsample_pvec(points: jnp.ndarray, var: jnp.ndarray,
                          mask: jnp.ndarray, voxel_size: float,
                          out_max: int):
    """Covariance-aware downsample: centroid-average positions AND their
    3x3 covariances per voxel (reference down_sampling_pvec,
    voxel_map.hpp:39-81 — the map insert path's point type carries cov).

    Returns (out (out_max, 3), var_out (out_max, 3, 3), out_mask).
    """
    keys = vh.voxel_key(points, voxel_size)
    uniq, uvalid, inv = vh.dedup_keys(keys, mask > 0, out_max)
    U = out_max
    seg, w = jax.lax.optimization_barrier(
        (jnp.where(inv >= 0, inv, U),
         ((mask > 0) & (inv >= 0)).astype(points.dtype)))
    n = jnp.zeros((U,)).at[seg].add(w, mode="drop")
    s = jnp.zeros((U, 3)).at[seg].add(points * w[:, None], mode="drop")
    sv = jnp.zeros((U, 3, 3)).at[seg].add(
        var * w[:, None, None], mode="drop")
    inv_n = 1.0 / jnp.maximum(n, 1.0)
    out = s * inv_n[:, None]
    # running MEAN of member covariances, matching the reference's
    # incremental update var = (var*k + var_new)/(k+1)
    # (voxel_map.hpp:61-62) — NOT the variance of the mean
    var_out = sv * inv_n[:, None, None]
    return out, var_out, uvalid & (n > 0)
