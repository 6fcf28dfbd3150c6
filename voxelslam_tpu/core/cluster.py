"""Centered point-cluster statistics (the TPU-native `PointCluster`).

The reference accumulates raw second moments P = sum p p^T, v = sum p, N
(tools.hpp:304-365) and exploits that a rigid transform of a whole
cluster is closed-form (PointCluster::transform) — which makes the BA
cost independent of point count.

In f32 on kilometre-scale maps the raw parameterization is numerically
fatal: cov = P/N - c c^T cancels ~|p|^2-sized terms down to
voxel-sized ones. We therefore keep *centered* statistics

    n  : point count          (...,)
    mu : mean                 (..., 3)
    S  : sum (p-mu)(p-mu)^T   (..., 3, 3)   (NOT divided by n)

which carry the exact same information, but S is translation-invariant
(only rotates under a rigid transform) and stays O(extent^2) — so the
whole pipeline runs in f32 where the reference needed f64.

All ops are batched over arbitrary leading dims. Empty clusters (n == 0)
are representable and propagate safely (mu = 0, S = 0).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.tree_util.register_dataclass,
         data_fields=["n", "mu", "S"], meta_fields=[])
@dataclasses.dataclass
class Cluster:
    n: jnp.ndarray    # (...,) float
    mu: jnp.ndarray   # (..., 3)
    S: jnp.ndarray    # (..., 3, 3) centered second moment (unnormalized)

    @staticmethod
    def empty(batch_shape=(), dtype=jnp.float32) -> "Cluster":
        bs = tuple(batch_shape)
        return Cluster(
            n=jnp.zeros(bs, dtype),
            mu=jnp.zeros(bs + (3,), dtype),
            S=jnp.zeros(bs + (3, 3), dtype),
        )

    def __getitem__(self, idx) -> "Cluster":
        return jax.tree.map(lambda x: x[idx], self)


def _safe_div(a: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    return a / jnp.maximum(n, 1.0)


def from_points(points: jnp.ndarray, mask: jnp.ndarray | None = None) -> Cluster:
    """Cluster of a (..., N, 3) point set with optional (..., N) mask."""
    if mask is None:
        mask = jnp.ones(points.shape[:-1], points.dtype)
    mask = mask.astype(points.dtype)
    n = jnp.sum(mask, axis=-1)
    mu = _safe_div(jnp.sum(points * mask[..., None], axis=-2), n[..., None])
    d = (points - mu[..., None, :]) * mask[..., None]
    S = jnp.einsum("...ni,...nj->...ij", d, d)
    return Cluster(n=n, mu=mu, S=S)


def merge(a: Cluster, b: Cluster) -> Cluster:
    """Combine two clusters (parallel-axis theorem); reference operator+=."""
    n = a.n + b.n
    mu = _safe_div(a.n[..., None] * a.mu + b.n[..., None] * b.mu, n[..., None])
    da = a.mu - mu
    db = b.mu - mu
    S = (a.S + b.S
         + a.n[..., None, None] * (da[..., :, None] * da[..., None, :])
         + b.n[..., None, None] * (db[..., :, None] * db[..., None, :]))
    # Keep exact-empty results exactly empty.
    both_empty = (n == 0)[..., None]
    mu = jnp.where(both_empty, 0.0, mu)
    S = jnp.where(both_empty[..., None], 0.0, S)
    return Cluster(n=n, mu=mu, S=S)


def subtract(total: Cluster, part: Cluster) -> Cluster:
    """Remove `part` from `total` (reference operator-=); assumes part ⊆ total."""
    n = total.n - part.n
    mu = _safe_div(total.n[..., None] * total.mu - part.n[..., None] * part.mu,
                   n[..., None])
    dt = total.mu - mu
    dp = part.mu - mu
    S = (total.S - part.S
         + total.n[..., None, None] * (dt[..., :, None] * dt[..., None, :])
         - part.n[..., None, None] * (dp[..., :, None] * dp[..., None, :]))
    empty = (n <= 0)
    return Cluster(
        n=jnp.maximum(n, 0.0),
        mu=jnp.where(empty[..., None], 0.0, mu),
        S=jnp.where(empty[..., None, None], 0.0, S),
    )


def transform(c: Cluster, R: jnp.ndarray, t: jnp.ndarray) -> Cluster:
    """Rigid transform of a cluster (reference PointCluster::transform):
    central moments rotate exactly, the mean moves."""
    mu = jnp.einsum("...ij,...j->...i", R, c.mu) + t
    S = R @ c.S @ jnp.swapaxes(R, -1, -2)
    # empty clusters keep mu = 0 so downstream `where`s stay clean
    empty = (c.n == 0)
    mu = jnp.where(empty[..., None], 0.0, mu)
    return Cluster(n=c.n, mu=mu, S=S)


def cov(c: Cluster) -> jnp.ndarray:
    """Normalized covariance S/n (reference PointCluster::cov)."""
    return c.S / jnp.maximum(c.n, 1.0)[..., None, None]


def raw_moments(c: Cluster):
    """Recover raw (P, v, N) for interop/tests (P = S + n mu mu^T)."""
    v = c.n[..., None] * c.mu
    P = c.S + c.n[..., None, None] * (c.mu[..., :, None] * c.mu[..., None, :])
    return P, v, c.n
