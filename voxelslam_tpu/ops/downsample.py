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
