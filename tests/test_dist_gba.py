"""Distributed hierarchical GBA over the virtual 8-device CPU mesh.

The production path: HbaRunner(mesh=...) batches bottom-up windows and
runs them through parallel.dist_gba.make_window_fleet — shard_map of the
vmapped single-device window step over axis "win". The sharded runner
must produce the SAME submaps and edges as the single-device runner on
the same keyframe stream (identical jitted math, only the batching
differs), and the pose-system assembly used by the top-down solve must
match a dense-scatter oracle.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from voxelslam_tpu.gba import HbaRunner
from voxelslam_tpu.io import simulator as sim
from voxelslam_tpu.loop import posegraph as pg
from tests.test_gba import make_keyframes, gba_cfg, P


@pytest.fixture(scope="module")
def scene():
    return sim.make_scene()


def _clone_kfs(kfs):
    return [dataclasses.replace(k) for k in kfs]


class TestWindowFleet:
    @pytest.mark.slow
    def test_sharded_matches_single_device(self, scene):
        kfs, _ = make_keyframes(scene, 25, seed=3, perturb=0.02)
        devs = jax.devices()
        assert len(devs) >= 8, "conftest should force 8 virtual devices"
        mesh = Mesh(np.array(devs[:4]), ("win",))

        single = HbaRunner(gba_cfg(), kf_point_max=P, capacity=1 << 12,
                           unique_max=2048)
        sharded = HbaRunner(gba_cfg(), kf_point_max=P, capacity=1 << 12,
                            unique_max=2048, mesh=mesh)
        single.bottom_up(_clone_kfs(kfs))
        sharded.bottom_up(_clone_kfs(kfs))

        assert len(single.submaps) == len(sharded.submaps) > 1
        assert len(single.edges1) == len(sharded.edges1) > 0
        for e1, e2 in zip(single.edges1, sharded.edges1):
            assert (e1.id_a, e1.id_b, e1.ord_a, e1.ord_b) == \
                (e2.id_a, e2.id_b, e2.ord_a, e2.ord_b)
            np.testing.assert_allclose(e1.R, e2.R, atol=2e-4)
            np.testing.assert_allclose(e1.t, e2.t, atol=2e-3)
            # v6 = 1/|H_ij| amplifies f32 fusion-order noise on
            # near-zero off-diagonals; weights only need coarse parity
            np.testing.assert_allclose(e1.v6, e2.v6, rtol=0.3)
        for s1, s2 in zip(single.submaps, sharded.submaps):
            np.testing.assert_allclose(s1.p0, s2.p0, atol=2e-3)
            assert abs(float(s1.mask.sum()) - float(s2.mask.sum())) < 32

    @pytest.mark.slow
    def test_fleet_pads_partial_batches(self, scene):
        """A queue smaller than the fleet batch still flushes correctly
        (padding windows discarded)."""
        kfs, _ = make_keyframes(scene, 10, seed=5, perturb=0.01)
        mesh = Mesh(np.array(jax.devices()[:8]), ("win",))
        hba = HbaRunner(gba_cfg(), kf_point_max=P, capacity=1 << 12,
                        unique_max=2048, mesh=mesh)
        for kf in kfs:
            hba.add_keyframe(kf)
        assert len(hba.submaps) == 0          # one window queued
        out = hba.flush()
        assert out is not None and out["flushed"] == 1
        assert len(hba.submaps) == 1
        assert len(hba.edges1) > 0


class TestPoseSystemAssembly:
    def test_matches_scatter_oracle(self):
        """assemble_pose_system (one-hot matmul strips) must equal the
        naive dense scatter assembly."""
        rng = np.random.default_rng(0)
        K, E = 12, 40
        i_idx = rng.integers(0, K - 1, E).astype(np.int32)
        j_idx = (i_idx + rng.integers(1, K - i_idx)).astype(np.int32)
        r = rng.normal(0, 1, (E, 6)).astype(np.float32)
        Ji = rng.normal(0, 1, (E, 6, 6)).astype(np.float32)
        Jj = rng.normal(0, 1, (E, 6, 6)).astype(np.float32)
        w6 = rng.uniform(0.1, 2.0, (E, 6)).astype(np.float32)

        H, g, chi = jax.jit(
            lambda *a: pg.assemble_pose_system(*a, K=K, chunk=16))(
            jnp.array(i_idx), jnp.array(j_idx), jnp.array(r),
            jnp.array(Ji), jnp.array(Jj), jnp.array(w6))

        Ho = np.zeros((6 * K, 6 * K))
        go = np.zeros(6 * K)
        for e in range(E):
            A = np.zeros((6, 6 * K))
            A[:, 6 * i_idx[e]:6 * i_idx[e] + 6] = Ji[e]
            A[:, 6 * j_idx[e]:6 * j_idx[e] + 6] = Jj[e]
            Aw = A * w6[e][:, None]
            Ho += Aw.T @ A
            go += Aw.T @ r[e]
        np.testing.assert_allclose(np.asarray(H), Ho, atol=1e-3)
        np.testing.assert_allclose(np.asarray(g), go, atol=1e-3)
        assert np.isclose(float(chi), float(np.sum(w6 * r * r)), rtol=1e-5)


class TestMultihost:
    def test_single_process_passthrough(self):
        """ensure_distributed is a safe no-op without a cluster env, and
        the global mesh spans the virtual devices."""
        from voxelslam_tpu.parallel import multihost as mh
        assert mh.ensure_distributed() is False   # no cluster here
        mesh = mh.global_win_mesh()
        assert mesh is not None and mesh.axis_names == ("win",)
        assert mesh.size == len(jax.devices())
        assert mh.global_win_mesh(min_devices=10 ** 6) is None

    def test_system_uses_global_mesh(self, scene):
        """SlamSystem wires the multi-device mesh into its HbaRunner."""
        from voxelslam_tpu.pipeline.system import SlamSystem
        from voxelslam_tpu.config import small_test_config
        sysm = SlamSystem(small_test_config(), enable_loop=True,
                          enable_gba=True)
        assert sysm.gba is not None
        assert sysm.gba.mesh is not None
        assert sysm.gba.mesh.size == len(jax.devices())
