"""Distributed hierarchical GBA over the virtual 8-device CPU mesh.

Checks the sharded path end-to-end: window BAs sharded over axis "win",
reduced keyframe pose system psum-reduced and solved replicated. The
sharded result must match the single-device result (same math, only the
reduction order differs) and iterating the step must contract the
pose-graph chi^2.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from voxelslam_tpu.core import cluster as cl
from voxelslam_tpu.core import so3
from voxelslam_tpu.ba.lidar_factor import FactorBatch
from voxelslam_tpu.parallel.dist_gba import make_gba_megastep


def _problem(seed=0, Nw=8, W=4, F=10, stride=2):
    """Synthetic HBA problem: keyframes on a noisy line, per-window plane
    factors whose clusters are sampled in the TRUE local frames."""
    rng = np.random.default_rng(seed)
    n_kf = stride * (Nw - 1) + W

    # true keyframe poses
    Rt, pt = [], []
    for i in range(n_kf):
        yaw = 0.05 * i
        Rt.append(np.array([[np.cos(yaw), -np.sin(yaw), 0],
                            [np.sin(yaw), np.cos(yaw), 0],
                            [0, 0, 1.0]]))
        pt.append(np.array([0.5 * i, 0.2 * i, 1.0]))
    Rt, pt = np.stack(Rt), np.stack(pt)

    def plane_cluster(nrm, c0, Rw, pw):
        t1 = np.cross(nrm, [1.0, 0.0, 0.13]); t1 /= np.linalg.norm(t1)
        t2 = np.cross(nrm, t1)
        uv = rng.uniform(-1, 1, (24, 2))
        w = c0 + uv[:, :1] * t1 + uv[:, 1:] * t2
        w += nrm * rng.normal(0, 0.005, (24, 1))
        local = (w - pw) @ Rw
        return cl.from_points(jnp.array(local, jnp.float32))

    wins = []
    for iw in range(Nw):
        s = iw * stride
        facs = []
        for _ in range(F):
            nrm = rng.normal(size=3); nrm /= np.linalg.norm(nrm)
            c0 = pt[s] + rng.normal(0, 4, 3)
            facs.append(jax.tree.map(
                lambda *z: jnp.stack(z),
                *[plane_cluster(nrm, c0, Rt[s + k], pt[s + k])
                  for k in range(W)]))
        wins.append(jax.tree.map(lambda *z: jnp.stack(z), *facs))
    win = jax.tree.map(lambda *z: jnp.stack(z), *wins)
    factors = FactorBatch(win=win, fix=cl.Cluster.empty((Nw, F)),
                          coeff=jnp.ones((Nw, F)),
                          valid=jnp.ones((Nw, F), bool))

    # window-pose initial guesses = perturbed truth
    Rs = np.zeros((Nw, W, 3, 3), np.float32)
    ps = np.zeros((Nw, W, 3), np.float32)
    for iw in range(Nw):
        s = iw * stride
        for k in range(W):
            d = rng.normal(0, 0.02, 3) if k else np.zeros(3)
            Rs[iw, k] = Rt[s + k] @ np.asarray(so3.exp(jnp.array(d, jnp.float32)))
            ps[iw, k] = pt[s + k] + (rng.normal(0, 0.05, 3) if k else 0.0)
    starts = jnp.arange(Nw, dtype=jnp.int32) * stride
    kf_R = jnp.array(Rt @ np.eye(3), jnp.float32)
    kf_p = jnp.array(pt + rng.normal(0, 0.08, pt.shape), jnp.float32)
    return (factors, jnp.array(Rs), jnp.array(ps), starts,
            kf_R, kf_p, Rt, pt, n_kf)


def _run(mesh_devs, prob):
    factors, Rs, ps, starts, kf_R, kf_p, Rt, pt, n_kf = prob
    mesh = Mesh(np.array(mesh_devs), ("win",))
    shard = NamedSharding(mesh, P("win"))
    repl = NamedSharding(mesh, P())
    args = (jax.device_put(factors, shard), jax.device_put(Rs, shard),
            jax.device_put(ps, shard), jax.device_put(starts, shard),
            jax.device_put(kf_R, repl), jax.device_put(kf_p, repl))
    step = make_gba_megastep(mesh, n_kf=n_kf)
    return step(*args)


class TestDistGBA:
    def test_sharded_matches_single_device(self):
        prob = _problem()
        devs = jax.devices()
        assert len(devs) >= 8, "conftest should force 8 virtual devices"
        out8 = _run(devs[:8], prob)
        out1 = _run(devs[:1], prob)
        np.testing.assert_allclose(np.asarray(out8[0]), np.asarray(out1[0]),
                                   atol=5e-4)
        np.testing.assert_allclose(np.asarray(out8[1]), np.asarray(out1[1]),
                                   atol=5e-3)
        assert np.isfinite(float(out8[3]))

    def test_step_contracts_pose_error(self):
        prob = _problem(seed=1)
        factors, Rs, ps, starts, kf_R, kf_p, Rt, pt, n_kf = prob
        devs = jax.devices()[:8]
        mesh = Mesh(np.array(devs), ("win",))
        shard = NamedSharding(mesh, P("win"))
        repl = NamedSharding(mesh, P())
        step = make_gba_megastep(mesh, n_kf=n_kf)
        fa = jax.device_put(factors, shard)
        Ra = jax.device_put(Rs, shard)
        pa = jax.device_put(ps, shard)
        sa = jax.device_put(starts, shard)
        kR = jax.device_put(kf_R, repl)
        kp = jax.device_put(kf_p, repl)

        # anchor-relative position error (gauge: kf 0 pinned)
        def err(kp_arr):
            d = np.asarray(kp_arr) - np.asarray(kp_arr)[0] - (pt - pt[0])
            return float(np.linalg.norm(d, axis=1).mean())

        e0 = err(kp)
        chis = []
        for _ in range(3):
            kR, kp, resi, chi = step(fa, Ra, pa, sa, kR, kp)
            chis.append(float(chi))
        e1 = err(kp)
        assert e1 < 0.5 * e0, (e0, e1)
        assert chis[-1] <= chis[0] * 1.01, chis
