"""Brute-force k-nearest-neighbour + batched 5-point plane fits.

The reference leans on PCL kd-trees in four places (init LIO
voxelslam.cpp:1102-1252, keyframe radius search :1379-1438, ICP
loop_refine.hpp:47-145, BTC NN/NMS). Post-downsampling cloud sizes are
1e4-1e5 points, where masked brute-force top-k on the MXU beats a
pointer-chasing tree — distances are one big matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NMATCH = 5  # reference tools.hpp:17


def knn(query: jnp.ndarray, ref: jnp.ndarray, ref_mask: jnp.ndarray,
        k: int, chunk: int = 2048):
    """k nearest refs for each query. query (N,3), ref (M,3), ref_mask (M,).

    Returns (idx (N,k) int32, dist2 (N,k)). Invalid refs get +inf distance.
    Computed in query chunks to bound the (chunk, M) distance block.
    """
    N = query.shape[0]
    M = ref.shape[0]
    r2 = jnp.sum(ref * ref, axis=-1)
    penal = jnp.where(ref_mask > 0, 0.0, jnp.inf)

    pad = (-N) % chunk
    q = jnp.concatenate([query, jnp.zeros((pad, 3), query.dtype)], axis=0)
    q = q.reshape(-1, chunk, 3)

    def one(qc):
        d2 = (jnp.sum(qc * qc, axis=-1)[:, None] + r2[None, :]
              - 2.0 * qc @ ref.T) + penal[None, :]
        neg, idx = jax.lax.top_k(-d2, k)
        return idx.astype(jnp.int32), -neg

    idx, d2 = jax.lax.map(one, q)
    idx = idx.reshape(-1, k)[:N]
    d2 = d2.reshape(-1, k)[:N]
    return idx, jnp.maximum(d2, 0.0)


def plane_fit_nn(query_world: jnp.ndarray, ref: jnp.ndarray,
                 ref_mask: jnp.ndarray, resid_thr: float = 0.1,
                 max_dist2: float = 4.0):
    """5-NN plane fit per query (reference lio_state_estimation_kdtree,
    voxelslam.cpp:1159-1191): solve A x = -1 for the plane in Hesse-like
    form, check all 5 residuals, return unit normal + offset.

    Unlike the reference's kd-tree (which only ever holds real points),
    the padded brute-force table can return masked/padding slots as
    "neighbours" — so a fit is only valid when all NMATCH neighbours are
    real (finite distance) and within sqrt(max_dist2) metres.

    Returns dict(valid, normal (N,3), d (N,)) with plane n.x + d = 0.
    """
    from ..core.eig3 import eigh3

    idx, d2 = knn(query_world, ref, ref_mask, NMATCH)
    nn_ok = jnp.all(jnp.isfinite(d2) & (d2 <= max_dist2), axis=-1)
    A = ref[idx]  # (N, 5, 3)
    # centered eigen fit — the reference solves A x = -1 in f64
    # (colPivHouseholderQr); in f32 that system is ill-conditioned
    # (condition ~ (|offset|/spread)^4), so fit through the centroid.
    c = jnp.mean(A, axis=1)
    D = A - c[:, None, :]
    M = jnp.einsum("nki,nkj->nij", D, D)
    w, V = eigh3(M)
    normal = V[:, :, 0]
    d = -jnp.einsum("ni,ni->n", normal, c)       # plane: n.x + d = 0
    # reference's residual gate |direct . a + 1| <= 0.1 is relative to the
    # plane's distance from the origin: |n.a + d| <= 0.1 |d|
    resid = jnp.abs(jnp.einsum("nki,ni->nk", A, normal) + d[:, None])
    ok = jnp.all(resid <= resid_thr * jnp.maximum(jnp.abs(d)[:, None], 1e-6),
                 axis=-1)
    valid = ok & nn_ok & jnp.all(jnp.isfinite(normal), axis=-1)
    # zero out invalid rows so masked downstream math never sees NaN/inf
    normal = jnp.where(valid[:, None], normal, 0.0)
    d = jnp.where(valid, d, 0.0)
    return dict(valid=valid, normal=normal, d=d)
