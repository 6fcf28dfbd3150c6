import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voxelslam_tpu.core.state import NavState
from voxelslam_tpu.imu import preintegration as pre
from voxelslam_tpu.imu import ekf
from voxelslam_tpu.io import simulator as sim


def _midpoint_samples(ts, gyr, acc):
    """Convert an IMU stream into midpoint samples over intervals."""
    g = 0.5 * (gyr[:-1] + gyr[1:])
    a = 0.5 * (acc[:-1] + acc[1:])
    dt = np.diff(ts)
    return g.astype(np.float32), a.astype(np.float32), dt.astype(np.float32)


def _state_from_traj(traj, t, g=(0, 0, -9.8), bg=None, ba=None):
    R, p, v = traj.state_at(t)
    s = NavState.identity()
    s = dataclasses.replace(
        s, R=jnp.array(R, jnp.float32), p=jnp.array(p, jnp.float32),
        v=jnp.array(v, jnp.float32), g=jnp.array(g, jnp.float32),
        t=jnp.array(t, jnp.float32))
    if bg is not None:
        s = dataclasses.replace(s, bg=jnp.array(bg, jnp.float32))
    if ba is not None:
        s = dataclasses.replace(s, ba=jnp.array(ba, jnp.float32))
    return s


NOISE_MEAS = jnp.eye(6) * 1e-4
NOISE_WALK = jnp.eye(6) * 1e-6


class TestPreintegration:
    @pytest.mark.slow
    def test_residual_zero_on_truth(self):
        traj = sim.make_trajectory(duration=1.0)
        ts, gyr, acc = sim.imu_stream(traj, rate=400.0, t0=0.2, t1=0.5)
        g, a, dt = _midpoint_samples(ts, gyr, acc)
        p = pre.integrate(jnp.array(g), jnp.array(a), jnp.array(dt),
                          jnp.ones(len(dt)), jnp.zeros(3), jnp.zeros(3),
                          NOISE_MEAS, NOISE_WALK)
        st1 = _state_from_traj(traj, ts[0])
        st2 = _state_from_traj(traj, ts[-1])
        r = np.asarray(pre.residual(p, st1, st2))
        assert np.abs(r[:3]).max() < 2e-3, r[:3]     # rotation
        assert np.abs(r[3:6]).max() < 2e-3, r[3:6]   # position
        assert np.abs(r[6:9]).max() < 2e-3, r[6:9]   # velocity

    @pytest.mark.slow
    def test_mask_padding_noop(self):
        traj = sim.make_trajectory(duration=1.0)
        ts, gyr, acc = sim.imu_stream(traj, rate=200.0, t0=0.0, t1=0.3)
        g, a, dt = _midpoint_samples(ts, gyr, acc)
        p1 = pre.integrate(jnp.array(g), jnp.array(a), jnp.array(dt),
                           jnp.ones(len(dt)), jnp.zeros(3), jnp.zeros(3),
                           NOISE_MEAS, NOISE_WALK)
        # pad with garbage + zero mask
        gp = np.concatenate([g, np.ones((5, 3), np.float32) * 99])
        ap = np.concatenate([a, np.ones((5, 3), np.float32) * -99])
        dtp = np.concatenate([dt, np.ones(5, np.float32)])
        mk = np.concatenate([np.ones(len(dt)), np.zeros(5)])
        p2 = pre.integrate(jnp.array(gp), jnp.array(ap), jnp.array(dtp),
                           jnp.array(mk), jnp.zeros(3), jnp.zeros(3),
                           NOISE_MEAS, NOISE_WALK)
        np.testing.assert_allclose(np.asarray(p1.R_delta), np.asarray(p2.R_delta),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(p1.p_delta), np.asarray(p2.p_delta),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(p1.cov), np.asarray(p2.cov), atol=1e-9)

    @pytest.mark.slow
    def test_bias_jacobians_finite_difference(self):
        traj = sim.make_trajectory(duration=1.0)
        ts, gyr, acc = sim.imu_stream(traj, rate=200.0, t0=0.1, t1=0.4)
        g, a, dt = _midpoint_samples(ts, gyr, acc)
        args = (jnp.array(g), jnp.array(a), jnp.array(dt), jnp.ones(len(dt)))
        eps = 1e-3
        for k in range(3):
            db = np.zeros(3, np.float32)
            db[k] = eps
            p0 = pre.integrate(*args, jnp.zeros(3), jnp.zeros(3), NOISE_MEAS, NOISE_WALK)
            pg = pre.integrate(*args, jnp.array(db), jnp.zeros(3), NOISE_MEAS, NOISE_WALK)
            pa = pre.integrate(*args, jnp.zeros(3), jnp.array(db), NOISE_MEAS, NOISE_WALK)
            # d p_delta / d bg ~ p_bg
            fd_p_bg = (np.asarray(pg.p_delta) - np.asarray(p0.p_delta)) / eps
            np.testing.assert_allclose(fd_p_bg, np.asarray(p0.p_bg)[:, k],
                                       atol=2e-2, rtol=0.05)
            fd_v_bg = (np.asarray(pg.v_delta) - np.asarray(p0.v_delta)) / eps
            np.testing.assert_allclose(fd_v_bg, np.asarray(p0.v_bg)[:, k],
                                       atol=2e-2, rtol=0.05)
            fd_p_ba = (np.asarray(pa.p_delta) - np.asarray(p0.p_delta)) / eps
            np.testing.assert_allclose(fd_p_ba, np.asarray(p0.p_ba)[:, k],
                                       atol=2e-2, rtol=0.05)
            # rotation: Log(R0^T Rg) ~ R_bg db
            dR = np.asarray(p0.R_delta).T @ np.asarray(pg.R_delta)
            from voxelslam_tpu.core import so3
            fd_r = np.asarray(so3.log(jnp.array(dR))) / eps
            np.testing.assert_allclose(fd_r, np.asarray(p0.R_bg)[:, k],
                                       atol=2e-2, rtol=0.05)

    def test_integrate_matches_sequential(self):
        """Log-depth associative integrate must reproduce the
        sequential scan, including masked padding samples."""
        rng = np.random.default_rng(2)
        N = 23
        gyr = jnp.array(rng.normal(0, 0.4, (N, 3)), jnp.float32)
        acc = jnp.array(rng.normal(0, 1.0, (N, 3)) + np.array([0, 0, 9.8]),
                        jnp.float32)
        dt = jnp.array(np.full(N, 0.005) + rng.random(N) * 0.002, jnp.float32)
        mask = jnp.array(np.concatenate([np.ones(18), np.zeros(5)]),
                         jnp.float32)
        bg = jnp.array([0.01, -0.02, 0.005])
        ba = jnp.array([0.1, -0.05, 0.02])
        nm = jnp.eye(6) * 0.01
        nw = jnp.eye(6) * 1e-4
        a = jax.jit(pre.integrate_sequential)(gyr, acc, dt, mask, bg, ba,
                                              nm, nw)
        b = jax.jit(pre.integrate)(gyr, acc, dt, mask, bg, ba, nm, nw)
        for f in pre.Preint.__dataclass_fields__:
            va, vb = np.asarray(getattr(a, f)), np.asarray(getattr(b, f))
            scale = max(1.0, np.abs(va).max())
            np.testing.assert_allclose(vb, va, atol=1e-5 * scale,
                                       err_msg=f)

    @pytest.mark.slow
    def test_merge_equals_full(self):
        traj = sim.make_trajectory(duration=1.0)
        ts, gyr, acc = sim.imu_stream(traj, rate=200.0, t0=0.0, t1=0.6)
        g, a, dt = _midpoint_samples(ts, gyr, acc)
        h = len(dt) // 2
        args = lambda s: (jnp.array(g[s]), jnp.array(a[s]), jnp.array(dt[s]),
                          jnp.ones(len(dt[s])))
        full = pre.integrate(*args(slice(None)), jnp.zeros(3), jnp.zeros(3),
                             NOISE_MEAS, NOISE_WALK)
        p1 = pre.integrate(*args(slice(0, h)), jnp.zeros(3), jnp.zeros(3),
                           NOISE_MEAS, NOISE_WALK)
        p2 = pre.integrate(*args(slice(h, None)), jnp.zeros(3), jnp.zeros(3),
                           NOISE_MEAS, NOISE_WALK)
        m = pre.merge(p1, p2)
        np.testing.assert_allclose(np.asarray(m.R_delta), np.asarray(full.R_delta), atol=1e-5)
        np.testing.assert_allclose(np.asarray(m.p_delta), np.asarray(full.p_delta), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.v_delta), np.asarray(full.v_delta), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.p_bg), np.asarray(full.p_bg), atol=1e-3)
        np.testing.assert_allclose(np.asarray(m.v_bg), np.asarray(full.v_bg), atol=1e-3)
        np.testing.assert_allclose(np.asarray(m.R_bg), np.asarray(full.R_bg), atol=1e-4)
        np.testing.assert_allclose(np.asarray(m.cov), np.asarray(full.cov),
                                   atol=1e-6, rtol=0.01)

    @pytest.mark.slow
    def test_evaluate_jacobian_matches_fd(self):
        traj = sim.make_trajectory(duration=1.0)
        ts, gyr, acc = sim.imu_stream(traj, rate=200.0, t0=0.2, t1=0.45)
        g, a, dt = _midpoint_samples(ts, gyr, acc)
        p = pre.integrate(jnp.array(g), jnp.array(a), jnp.array(dt),
                          jnp.ones(len(dt)), jnp.zeros(3), jnp.zeros(3),
                          NOISE_MEAS, NOISE_WALK)
        st1 = _state_from_traj(traj, ts[0])
        st2 = _state_from_traj(traj, ts[-1]).boxplus(jnp.ones(15) * 0.01)
        chi, H, b = pre.evaluate(p, st1, st2)
        assert np.isfinite(float(chi))
        assert H.shape == (30, 30) and b.shape == (30,)
        # gradient of 0.5 chi2 wrt dx2 should equal b[15:]
        def f(dx):
            return 0.5 * pre.chi2(p, st1, st2.boxplus(dx))
        gfd = np.asarray(jax.grad(f)(jnp.zeros(15)))
        np.testing.assert_allclose(gfd, np.asarray(b[15:]), rtol=1e-3, atol=1e-3)

    def test_bias_reparam_consistency(self):
        # residual with (bias shift dbg applied through Jacobians) should
        # approximate a re-integration with the shifted bias
        traj = sim.make_trajectory(duration=1.0)
        ts, gyr, acc = sim.imu_stream(traj, rate=200.0, t0=0.0, t1=0.3)
        g, a, dt = _midpoint_samples(ts, gyr, acc)
        args = (jnp.array(g), jnp.array(a), jnp.array(dt), jnp.ones(len(dt)))
        db = jnp.array([0.01, -0.02, 0.015])
        p_lin = pre.integrate(*args, jnp.zeros(3), jnp.zeros(3), NOISE_MEAS, NOISE_WALK)
        p_re = pre.integrate(*args, db, jnp.zeros(3), NOISE_MEAS, NOISE_WALK)
        st1 = _state_from_traj(traj, ts[0], bg=db)
        st2 = _state_from_traj(traj, ts[-1], bg=db)
        r_lin = np.asarray(pre.residual(p_lin, st1, st2))
        r_re = np.asarray(pre.residual(p_re, st1, st2))
        np.testing.assert_allclose(r_lin, r_re, atol=5e-3)


class TestEKF:
    def _setup(self, t0=0.3, t1=0.4, rate=400.0):
        traj = sim.make_trajectory(duration=1.0, speed=1.5, wobble=0.5)
        ts, gyr, acc = sim.imu_stream(traj, rate=rate, t0=t0 - 0.01, t1=t1 + 0.005)
        return traj, ts, gyr, acc

    def test_propagate_tracks_truth(self):
        traj, ts, gyr, acc = self._setup()
        st = _state_from_traj(traj, 0.3)
        covd = jnp.ones(3) * 1e-4
        new_st, poses = ekf.propagate(
            st, jnp.array(ts, jnp.float32), jnp.array(gyr, jnp.float32),
            jnp.array(acc, jnp.float32), jnp.ones(len(ts)),
            0.3, 0.4, 0.3, covd, covd, covd * 0.01, covd * 0.01)
        R_t, p_t, v_t = traj.state_at(0.4)
        np.testing.assert_allclose(np.asarray(new_st.p), p_t, atol=2e-3)
        np.testing.assert_allclose(np.asarray(new_st.v), v_t, atol=5e-3)
        np.testing.assert_allclose(np.asarray(new_st.R), R_t, atol=2e-3)
        # covariance grew and stayed symmetric PSD-ish
        c = np.asarray(new_st.cov)
        assert np.all(np.diag(c)[:9] >= np.diag(np.asarray(st.cov))[:9] - 1e-9)
        np.testing.assert_allclose(c, c.T, atol=1e-8)

    def test_propagate_matches_sequential(self):
        """The log-depth associative propagate must reproduce the
        sequential lax.scan formulation (mean, covariance, and cached
        de-skew poses), including padded/masked samples."""
        traj, ts, gyr, acc = self._setup()
        st = _state_from_traj(traj, 0.3)
        covd = jnp.ones(3) * 1e-4
        # pad with invalid tail samples to exercise masking
        pad = 7
        ts_p = np.concatenate([ts, np.full(pad, ts[-1])])
        gyr_p = np.concatenate([gyr, np.zeros((pad, 3))])
        acc_p = np.concatenate([acc, np.zeros((pad, 3))])
        mask = np.concatenate([np.ones(len(ts)), np.zeros(pad)])
        args = (st, jnp.array(ts_p, jnp.float32),
                jnp.array(gyr_p, jnp.float32), jnp.array(acc_p, jnp.float32),
                jnp.array(mask, jnp.float32), 0.3, 0.4, 0.3,
                covd, covd, covd * 0.01, covd * 0.01)
        st_a, poses_a = ekf.propagate(*args)
        st_s, poses_s = ekf.propagate_sequential(*args)
        np.testing.assert_allclose(np.asarray(st_a.p), np.asarray(st_s.p),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_a.v), np.asarray(st_s.v),
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(st_a.R), np.asarray(st_s.R),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(st_a.cov),
                                   np.asarray(st_s.cov), atol=1e-6)
        for fa, fs in zip((poses_a.offt, poses_a.R, poses_a.p, poses_a.v,
                           poses_a.w, poses_a.a),
                          (poses_s.offt, poses_s.R, poses_s.p, poses_s.v,
                           poses_s.w, poses_s.a)):
            np.testing.assert_allclose(
                np.where(np.isfinite(fa), fa, 0.0),
                np.where(np.isfinite(fs), fs, 0.0), atol=1e-5)

    def test_deskew_recovers_static_geometry(self):
        # Raycast a moving scan against the room; after deskew, points
        # transformed with the scan-end pose must land back on the planes.
        traj, ts, gyr, acc = self._setup()
        normals, dsp = sim.box_room()
        scan = sim.lidar_scan(traj, 0.3, 0.4, normals, dsp, n_az=60, n_el=8)
        st = _state_from_traj(traj, 0.3)
        covd = jnp.ones(3) * 1e-4
        new_st, poses = ekf.propagate(
            st, jnp.array(ts, jnp.float32), jnp.array(gyr, jnp.float32),
            jnp.array(acc, jnp.float32), jnp.ones(len(ts)),
            0.3, 0.4, 0.3, covd, covd, covd * 0.01, covd * 0.01)
        pts = jnp.array(scan["points"])
        des = ekf.deskew(pts, jnp.array(scan["offsets"]), poses, new_st,
                         jnp.eye(3), jnp.zeros(3))
        # world points using ground-truth end pose
        R_e, p_e, _ = traj.state_at(0.4)
        wld = np.asarray(des) @ R_e.T + p_e
        d = wld @ normals.T + dsp  # distance to each plane
        dmin = np.abs(d).min(axis=1)
        hit = scan["hit"]
        assert np.quantile(dmin[hit], 0.95) < 0.01, np.quantile(dmin[hit], 0.95)
        # sanity: without deskew the distortion is much larger
        wld0 = np.asarray(pts) @ R_e.T + p_e
        d0 = np.abs(wld0 @ normals.T + dsp).min(axis=1)
        assert np.quantile(d0[hit], 0.95) > 5 * np.quantile(dmin[hit], 0.95)

    def test_static_init(self):
        acc = np.tile(np.array([0.1, 0.0, 9.8]), (50, 1)).astype(np.float32)
        gyr = np.tile(np.array([0.01, -0.02, 0.0]), (50, 1)).astype(np.float32)
        gvec, mg, scale, n = ekf.static_init(jnp.array(acc), jnp.array(gyr),
                                             jnp.ones(50))
        np.testing.assert_allclose(np.asarray(gvec), [-0.1, 0, -9.8], atol=1e-5)
        np.testing.assert_allclose(np.asarray(mg), [0.01, -0.02, 0.0], atol=1e-6)
        assert float(scale) == 1.0 and int(n) == 50
        # livox g-normalized
        gv2, _, scale2, _ = ekf.static_init(jnp.array(acc / 9.8), jnp.array(gyr),
                                            jnp.ones(50), livox_g_normalized=True)
        assert abs(float(scale2) - 9.8) < 1e-5
        np.testing.assert_allclose(np.asarray(gv2), [-0.1, 0, -9.8], atol=1e-4)
