"""Voxel downsampler variants vs numpy references.

Covers the three reference downsamplers: centroid average
(down_sampling_voxel, tools.hpp:201), closest-to-centroid
(down_sampling_close, tools.hpp:240), and covariance-aware
(down_sampling_pvec, voxel_map.hpp:39-81 in the reference tree).
"""

import numpy as np
import jax.numpy as jnp

from voxelslam_tpu.ops.downsample import (
    voxel_downsample, voxel_downsample_close, voxel_downsample_pvec)


def _np_groups(pts, voxel):
    keys = np.floor(pts / voxel).astype(np.int64)
    groups = {}
    for i, k in enumerate(map(tuple, keys)):
        groups.setdefault(k, []).append(i)
    return groups


def test_centroid_matches_numpy(rng):
    pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    mask = (rng.uniform(size=300) > 0.1).astype(np.float32)
    out, om, n = voxel_downsample(jnp.array(pts), jnp.array(mask), 1.0, 256)
    out, om = np.asarray(out), np.asarray(om)

    groups = _np_groups(pts[mask > 0], 1.0)
    cents = sorted(np.round(np.mean(pts[mask > 0][idx], axis=0), 4).tolist()
                   for idx in groups.values())
    got = sorted(np.round(out[om], 4).tolist())
    assert len(got) == len(cents)
    np.testing.assert_allclose(got, cents, atol=1e-3)


def test_close_returns_real_points(rng):
    pts = rng.uniform(-5, 5, (300, 3)).astype(np.float32)
    mask = np.ones(300, np.float32)
    out, om, src = voxel_downsample_close(jnp.array(pts), jnp.array(mask),
                                          1.0, 256)
    out, om, src = np.asarray(out), np.asarray(om), np.asarray(src)
    # every output row is an actual input point
    assert np.all(src[om] >= 0)
    np.testing.assert_allclose(out[om], pts[src[om]], atol=0)

    # and it is the one closest to its voxel centroid
    groups = _np_groups(pts, 1.0)
    expect = set()
    for idx in groups.values():
        sub = pts[idx]
        c = sub.mean(0)
        d = np.sum((sub - c) ** 2, axis=1)
        expect.add(int(np.array(idx)[np.argmin(d)]))
    assert set(src[om].tolist()) == expect


def test_pvec_averages_covariances(rng):
    pts = rng.uniform(-3, 3, (200, 3)).astype(np.float32)
    var = np.einsum("ni,nj->nij", pts * 0 + 1.0,
                    np.abs(rng.uniform(0.5, 1.5, (200, 3)))).astype(np.float32)
    var = 0.5 * (var + np.swapaxes(var, 1, 2))
    mask = np.ones(200, np.float32)
    out, vout, om = voxel_downsample_pvec(jnp.array(pts), jnp.array(var),
                                          jnp.array(mask), 1.0, 256)
    out, vout, om = np.asarray(out), np.asarray(vout), np.asarray(om)

    groups = _np_groups(pts, 1.0)
    ref = {}
    for idx in groups.values():
        c = tuple(np.round(pts[idx].mean(0), 3))
        ref[c] = var[idx].mean(0)   # reference keeps the covariance MEAN
    for row, v in zip(out[om], vout[om]):
        key = tuple(np.round(row, 3))
        assert key in ref
        np.testing.assert_allclose(v, ref[key], atol=1e-4)


def test_masked_points_dropped(rng):
    pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
    mask = np.zeros(100, np.float32)
    out, om, _ = voxel_downsample(jnp.array(pts), jnp.array(mask), 1.0, 64)
    assert not np.any(np.asarray(om))
    out, om, _ = voxel_downsample_close(jnp.array(pts), jnp.array(mask),
                                        1.0, 64)
    assert not np.any(np.asarray(om))
