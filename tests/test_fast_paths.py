"""The TPU fast paths must match their reference formulations exactly:

  * factor-minor Newton assembly (hess_grad_ct_t / cost_t) vs the
    F-major closed form (itself autodiff-verified in test_ba)
  * map.harvest_t vs transpose_factors(map.harvest)
  * closed-form IMU factor Jacobian vs jacfwd of the boxplus-perturbed
    residual
"""

import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voxelslam_tpu.ba import lidar_factor as lf
from voxelslam_tpu.core.cluster import Cluster
from voxelslam_tpu.core.state import NavState
from voxelslam_tpu.core import so3
from voxelslam_tpu.imu import preintegration as pre
from voxelslam_tpu.map import voxel_map as vm
from voxelslam_tpu.config import MapConfig


def _rand_cluster(rng, shape):
    n = jnp.array(rng.integers(5, 40, shape).astype(np.float32))
    mu = jnp.array(rng.normal(0, 2, shape + (3,)).astype(np.float32))
    A = rng.normal(0, 1, shape + (3, 3)).astype(np.float32)
    S = jnp.array(A @ np.swapaxes(A, -1, -2) * 3.0)
    return Cluster(n=n, mu=mu, S=S)


def test_hess_grad_ct_t_matches_f_major(rng):
    F, W = 37, 10
    win = _rand_cluster(rng, (F, W))
    fix = _rand_cluster(rng, (F,))
    fix = Cluster(n=fix.n.at[: F // 3].set(0.0), mu=fix.mu, S=fix.S)
    f = lf.FactorBatch(win=win, fix=fix,
                       coeff=jnp.array(rng.random(F).astype(np.float32)),
                       valid=jnp.array(rng.random(F) > 0.2))
    Rs = jnp.array(np.stack([
        np.linalg.qr(rng.normal(0, 1, (3, 3)))[0] for _ in range(W)
    ]).astype(np.float32))
    Rs = Rs * jnp.sign(jnp.linalg.det(Rs))[:, None, None]
    ps = jnp.array(rng.normal(0, 1, (W, 3)).astype(np.float32))
    mask = jnp.array((rng.random(W) > 0.1).astype(np.float32))

    H0, g0 = jax.jit(lf.hess_grad_ct)(f, Rs, ps, mask)
    ft = lf.transpose_factors(f)
    H1, g1 = jax.jit(lf.hess_grad_ct_t)(ft, Rs, ps, mask)
    r0 = float(jax.jit(lf.cost)(f, Rs, ps, mask))
    r1 = float(jax.jit(lf.cost_t)(ft, Rs, ps, mask))
    sg = float(jnp.max(jnp.abs(g0)))
    sh = float(jnp.max(jnp.abs(H0)))
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=2e-5, atol=5e-4 * sg)
    np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                               rtol=2e-5, atol=5e-4 * sh)
    assert abs(r0 - r1) < 1e-3 * abs(r0)


@pytest.mark.slow
def test_harvest_t_matches_transposed_harvest(rng):
    cfg = MapConfig(capacities=(1 << 10, 1 << 10, 1 << 11),
                    unique_max=(512, 512, 1024))
    levels = vm.empty_map(cfg)
    W = cfg.win_size
    mp = jnp.arange(W, dtype=jnp.int32)
    for i in range(4):
        n = 600
        pts = np.stack([rng.uniform(-4, 4, n), rng.uniform(-4, 4, n),
                        rng.normal(0.5, 0.01, n)], -1).astype(np.float32)
        pj = jnp.array(pts)
        levels = vm.insert_scan(levels, cfg, pj, pj, jnp.full((n,), 1e-4),
                                jnp.ones(n), i)
    Rs = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
    ps = jnp.zeros((W, 3))
    levels = vm.refresh_planes(levels, cfg, Rs, ps, mp, 4)
    ftA = lf.transpose_factors(vm.harvest(levels, cfg, mp, 256))
    ftB = vm.harvest_t(levels, cfg, mp, 256)
    assert int(jnp.sum(ftB[6])) > 10
    for a, b in zip(ftA, ftB):
        assert a.shape == b.shape
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def _rand_state(rng):
    s = NavState.identity()
    return dataclasses.replace(
        s,
        R=so3.exp(jnp.array(rng.normal(0, 0.7, 3).astype(np.float32))),
        p=jnp.array(rng.normal(0, 2, 3).astype(np.float32)),
        v=jnp.array(rng.normal(0, 1, 3).astype(np.float32)),
        bg=jnp.array(rng.normal(0, 0.05, 3).astype(np.float32)),
        ba=jnp.array(rng.normal(0, 0.05, 3).astype(np.float32)),
        g=jnp.array((rng.normal(0, 0.1, 3) + [0, 0, -9.8]).astype(np.float32)))


@pytest.mark.slow
def test_imu_jacobian_closed_matches_jacfwd(rng):
    nm = jnp.eye(6) * 0.1
    for _ in range(3):
        st1, st2 = _rand_state(rng), _rand_state(rng)
        gyr = jnp.array(rng.normal(0, 0.4, (40, 3)).astype(np.float32))
        acc = (jnp.array(rng.normal(0, 1.0, (40, 3)).astype(np.float32))
               + jnp.array([0.0, 0.0, 9.8]))
        dt = jnp.full((40,), 0.0025)
        m = jnp.ones((40,))
        p = pre.integrate(gyr, acc, dt, m, st1.bg + 0.01, st1.ba - 0.02,
                          nm, nm * 1e-3)
        for wg in (False, True):
            chi0, jtj0, g0 = pre.evaluate(p, st1, st2, wg)
            chi1, jtj1, g1 = pre.evaluate_closed(p, st1, st2, wg)
            sc = float(jnp.max(jnp.abs(jtj0))) + 1e-9
            assert abs(float(chi0 - chi1)) < 1e-3 * (abs(float(chi0)) + 1)
            np.testing.assert_allclose(np.asarray(jtj1), np.asarray(jtj0),
                                       atol=2e-3 * sc)
            np.testing.assert_allclose(
                np.asarray(g1), np.asarray(g0),
                atol=2e-3 * (float(jnp.max(jnp.abs(g0))) + 1e-9))
