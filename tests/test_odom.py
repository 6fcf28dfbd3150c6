import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from voxelslam_tpu.config import small_test_config
from voxelslam_tpu.core.state import NavState
from voxelslam_tpu.map import voxel_map as vm
from voxelslam_tpu.odom import iekf
from voxelslam_tpu.ops import knn as knn_ops
from voxelslam_tpu.io import simulator as sim


def _build_room_map(cfg, traj, normals, dsp, n_frames=6, n_az=200, n_el=24,
                    noise=0.01):
    levels = vm.empty_map(cfg.map)
    W = cfg.map.win_size
    Rs = np.tile(np.eye(3)[None], (W, 1, 1)).astype(np.float32)
    ps = np.zeros((W, 3), np.float32)
    mp = jnp.arange(W, dtype=jnp.int32)
    for f in range(n_frames):
        t = 0.1 + 0.1 * f
        scan = sim.lidar_scan(traj, t, t + 1e-3, normals, dsp,
                              n_az=n_az, n_el=n_el, noise=noise, seed=f)
        R, p, _ = traj.state_at(t)
        pts_l = scan["points"][scan["hit"]]
        n = len(pts_l)
        pts_w = pts_l @ R.T + p
        levels = vm.insert_scan(levels, cfg.map, jnp.array(pts_w, jnp.float32),
                                jnp.array(pts_l, jnp.float32),
                                jnp.full((n,), 1e-4), jnp.ones(n), f)
        Rs[f], ps[f] = R, p
    levels = vm.refresh_planes(levels, cfg.map, jnp.array(Rs), jnp.array(ps),
                               mp, n_frames)
    return levels


class TestKNN:
    def test_knn_matches_numpy(self, rng):
        ref = rng.normal(size=(500, 3)).astype(np.float32)
        q = rng.normal(size=(50, 3)).astype(np.float32)
        idx, d2 = knn_ops.knn(jnp.array(q), jnp.array(ref), jnp.ones(500), 5)
        idx = np.sort(np.asarray(idx), axis=-1)
        d = ((q[:, None] - ref[None]) ** 2).sum(-1)
        ref_idx = np.sort(np.argsort(d, axis=-1)[:, :5], axis=-1)
        np.testing.assert_array_equal(idx, ref_idx)

    def test_plane_fit(self, rng):
        # points on z = 2 plane
        ref = np.stack([rng.uniform(-5, 5, 400), rng.uniform(-5, 5, 400),
                        np.full(400, 2.0) + rng.normal(0, 1e-3, 400)],
                       -1).astype(np.float32)
        q = ref[:20] + rng.normal(0, 0.01, (20, 3)).astype(np.float32)
        pf = knn_ops.plane_fit_nn(jnp.array(q), jnp.array(ref), jnp.ones(400))
        assert np.asarray(pf["valid"]).all()
        nrm = np.asarray(pf["normal"])
        assert np.all(np.abs(nrm[:, 2]) > 0.999)
        # plane residual at the query points: bounded by the query's own
        # injected noise (0.01 sigma per axis -> 4 sigma bound)
        resid = np.einsum("ni,ni->n", nrm, q) + np.asarray(pf["d"])
        np.testing.assert_allclose(resid, 0, atol=0.04)


class TestIEKF:
    def test_converges_to_true_pose(self, rng):
        cfg = small_test_config()
        traj = sim.make_trajectory(duration=2.0, speed=1.0)
        normals, dsp = sim.box_room()
        levels = _build_room_map(cfg, traj, normals, dsp)

        # new scan at t=0.75 with a deliberately wrong prior
        t = 0.75
        scan = sim.lidar_scan(traj, t, t + 1e-3, normals, dsp, n_az=200,
                              n_el=24, noise=0.01, seed=99)
        R, p, _ = traj.state_at(t)
        pts = scan["points"][scan["hit"]].astype(np.float32)
        n = len(pts)

        st = NavState.identity()
        st = dataclasses.replace(
            st, R=jnp.array(R, jnp.float32), p=jnp.array(p, jnp.float32),
            cov=jnp.eye(15) * 1e-2)
        st_bad = st.boxplus(jnp.array(
            [0.02, -0.02, 0.01, 0.15, -0.1, 0.08] + [0.0] * 9, jnp.float32))

        var_b = iekf.point_var_body(jnp.array(pts), 0.02, 0.005)
        st_new, ok, diag = iekf.iekf_update(
            st_bad, levels, cfg.map, jnp.array(pts), var_b, jnp.ones(n))

        p_err_before = float(jnp.linalg.norm(st_bad.p - jnp.array(p, jnp.float32)))
        p_err_after = float(jnp.linalg.norm(st_new.p - jnp.array(p, jnp.float32)))
        assert p_err_after < 0.25 * p_err_before, (p_err_before, p_err_after)
        assert p_err_after < 0.03, p_err_after
        assert bool(ok)
        assert int(diag["matches"]) > n * 0.4
        # posterior covariance shrank
        assert float(jnp.trace(st_new.cov[:6, :6])) < float(jnp.trace(st.cov[:6, :6]))

    def test_degeneracy_gate_fires(self, rng):
        # map with a single horizontal plane: x/y translation unobservable
        cfg = small_test_config()
        levels = vm.empty_map(cfg.map)
        pts = np.stack([rng.uniform(-8, 8, 3000), rng.uniform(-8, 8, 3000),
                        rng.normal(0.5, 0.005, 3000)], -1).astype(np.float32)
        levels = vm.insert_scan(levels, cfg.map, jnp.array(pts), jnp.array(pts),
                                jnp.full((3000,), 1e-4), jnp.ones(3000), 0)
        W = cfg.map.win_size
        Rs = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
        ps = jnp.zeros((W, 3))
        mp = jnp.arange(W, dtype=jnp.int32)
        levels = vm.refresh_planes(levels, cfg.map, Rs, ps, mp, 1)

        st = NavState.identity()
        st = dataclasses.replace(st, cov=jnp.eye(15) * 1e-2)
        q = pts[:500]
        var_b = iekf.point_var_body(jnp.array(q), 0.02, 0.005)
        st_new, ok, diag = iekf.iekf_update(st, levels, cfg.map, jnp.array(q),
                                            var_b, jnp.ones(len(q)))
        # plenty of matches but rank-deficient normal Gram -> divergence gate
        assert int(diag["matches"]) > 100
        assert not bool(ok)

    def test_kdtree_variant_converges(self, rng):
        # reference cloud = box room sampled densely; scan = subset
        traj = sim.make_trajectory(duration=1.0, speed=0.5)
        normals, dsp = sim.box_room()
        scan0 = sim.lidar_scan(traj, 0.1, 0.101, normals, dsp, n_az=250,
                               n_el=32, noise=0.005, seed=1)
        R0, p0, _ = traj.state_at(0.1)
        ref = (scan0["points"][scan0["hit"]] @ R0.T + p0).astype(np.float32)

        t = 0.2
        scan = sim.lidar_scan(traj, t, t + 1e-3, normals, dsp, n_az=120,
                              n_el=16, noise=0.005, seed=2)
        R, p, _ = traj.state_at(t)
        pts = scan["points"][scan["hit"]].astype(np.float32)

        st = NavState.identity()
        st = dataclasses.replace(
            st, R=jnp.array(R, jnp.float32), p=jnp.array(p, jnp.float32),
            cov=jnp.eye(15) * 1e-2)
        st_bad = st.boxplus(jnp.array(
            [0.01, 0.01, -0.01, 0.1, -0.08, 0.05] + [0.0] * 9, jnp.float32))
        st_new = iekf.iekf_update_kdtree(
            st_bad, jnp.array(ref), jnp.ones(len(ref)), jnp.array(pts),
            jnp.ones(len(pts)))
        e_before = float(jnp.linalg.norm(st_bad.p - jnp.array(p, jnp.float32)))
        e_after = float(jnp.linalg.norm(st_new.p - jnp.array(p, jnp.float32)))
        assert e_after < 0.4 * e_before, (e_before, e_after)
