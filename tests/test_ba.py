import dataclasses

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from voxelslam_tpu.core import so3, cluster as cl
from voxelslam_tpu.core.state import NavState
from voxelslam_tpu.ba import lidar_factor as lf
from voxelslam_tpu.ba import optimizers as opt
from voxelslam_tpu.imu import preintegration as pre
from voxelslam_tpu.io import simulator as sim


def _make_factors(rng, W=4, F=12, n_per=40, noise=0.002):
    """Random planes observed from W frames with known poses; returns
    factors built from LOCAL points + the true poses."""
    # true poses: small motions
    Rs, ps = [np.eye(3)], [np.zeros(3)]
    for i in range(1, W):
        w = rng.normal(0, 0.1, 3)
        Rs.append(Rs[-1] @ np.asarray(so3.exp(jnp.array(w, jnp.float32))))
        ps.append(ps[-1] + rng.normal(0, 0.3, 3))
    Rs, ps = np.stack(Rs).astype(np.float32), np.stack(ps).astype(np.float32)

    wins, fixes = [], []
    for f in range(F):
        # random plane: normal + offset
        nrm = rng.normal(size=3)
        nrm /= np.linalg.norm(nrm)
        c0 = rng.normal(0, 5, 3)
        t1 = np.cross(nrm, [1.0, 0, 0.01])
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(nrm, t1)
        frame_cl = []
        for i in range(W):
            uv = rng.uniform(-1, 1, (n_per, 2))
            pts_w = c0 + uv[:, :1] * t1 + uv[:, 1:] * t2
            pts_w += nrm * rng.normal(0, noise, (n_per, 1))
            pts_l = (pts_w - ps[i]) @ Rs[i]  # R^T (p - t)
            frame_cl.append(cl.from_points(jnp.array(pts_l, jnp.float32)))
        wins.append(jax.tree.map(lambda *x: jnp.stack(x), *frame_cl))
        fixes.append(cl.Cluster.empty())
    win = jax.tree.map(lambda *x: jnp.stack(x), *wins)
    fix = jax.tree.map(lambda *x: jnp.stack(x), *fixes)
    fb = lf.FactorBatch(win=win, fix=fix, coeff=jnp.ones(F), valid=jnp.ones(F, bool))
    return fb, jnp.array(Rs), jnp.array(ps)


class TestLidarFactor:
    def test_cost_small_at_truth(self, rng):
        fb, Rs, ps = _make_factors(rng, noise=0.001)
        mask = jnp.ones(Rs.shape[0])
        c = float(lf.cost(fb, Rs, ps, mask))
        assert c < 12 * 0.001**2 * 4  # ~F * noise^2
        # perturbed poses cost more
        Rs_b = Rs @ so3.exp(jnp.tile(jnp.array([0.02, 0, 0]), (4, 1)).at[0].set(0.0))
        c_b = float(lf.cost(fb, Rs_b, ps, mask))
        assert c_b > 3 * c

    def test_gradient_matches_fd(self, rng):
        fb, Rs, ps = _make_factors(rng, W=3, F=5)
        mask = jnp.ones(3)
        g = np.asarray(lf.grad(fb, Rs, ps, mask))
        eps = 1e-4
        for i in [1, 2]:
            for k in range(6):
                dx = np.zeros((3, 6), np.float32)
                dx[i, k] = eps
                cp = float(lf.cost_at(fb, Rs, ps, jnp.array(dx), mask))
                dx[i, k] = -eps
                cm = float(lf.cost_at(fb, Rs, ps, jnp.array(dx), mask))
                fd = (cp - cm) / (2 * eps)
                assert abs(fd - g[i, k]) < 5e-3 + 0.05 * abs(fd), (i, k, fd, g[i, k])

    @pytest.mark.slow
    def test_hessian_symmetric_psd_at_optimum(self, rng):
        fb, Rs, ps = _make_factors(rng, W=3, F=8, noise=1e-4)
        mask = jnp.ones(3)
        H, J = lf.hess_grad(fb, Rs, ps, mask)
        H = np.asarray(H)
        np.testing.assert_allclose(H, H.T, atol=1e-5)
        # at (near) the optimum the Hessian should be PSD up to noise
        w = np.linalg.eigvalsh(H)
        assert w.min() > -1e-3 * max(1.0, w.max())


    def test_analytic_hess_matches_autodiff(self, rng):
        """hess_grad_analytic (eigen-perturbation assembly) must equal
        hess_grad (jacfwd-of-grad) on mixed factors including
        fixed clusters, masked frames, and invalid rows."""
        fb, Rs, ps = _make_factors(rng, W=4, F=9, n_per=25, noise=0.02)
        # non-empty fixed clusters + some invalid factors
        fixpts = jnp.array(rng.normal(0, 2, (9, 12, 3)), jnp.float32)
        fb = dataclasses.replace(
            fb, fix=cl.from_points(fixpts),
            valid=jnp.array(rng.random(9) > 0.3))
        mask = jnp.ones(4).at[1].set(0.0)
        H0, g0 = jax.jit(lf.hess_grad)(fb, Rs, ps, mask)
        H1, g1 = jax.jit(lf.hess_grad_analytic)(fb, Rs, ps, mask)
        sH = float(jnp.max(jnp.abs(H0))) + 1e-6
        sg = float(jnp.max(jnp.abs(g0))) + 1e-6
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   atol=2e-4 * sg)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                                   atol=2e-3 * sH)

    def test_closed_form_hess_matches_autodiff(self, rng):
        """hess_grad_ct (fully closed-form assembly, the production
        Newton builder) must equal hess_grad (jacfwd-of-grad) on mixed
        factors including fixed clusters, masked frames, invalid rows."""
        fb, Rs, ps = _make_factors(rng, W=4, F=9, n_per=25, noise=0.02)
        fixpts = jnp.array(rng.normal(0, 2, (9, 12, 3)), jnp.float32)
        fb = dataclasses.replace(
            fb, fix=cl.from_points(fixpts),
            valid=jnp.array(rng.random(9) > 0.3))
        mask = jnp.ones(4).at[1].set(0.0)
        H0, g0 = jax.jit(lf.hess_grad)(fb, Rs, ps, mask)
        H1, g1 = jax.jit(lf.hess_grad_ct)(fb, Rs, ps, mask)
        sH = float(jnp.max(jnp.abs(H0))) + 1e-6
        sg = float(jnp.max(jnp.abs(g0))) + 1e-6
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                                   atol=2e-4 * sg)
        np.testing.assert_allclose(np.asarray(H1), np.asarray(H0),
                                   atol=2e-3 * sH)


class TestLMLidar:
    def test_recovers_poses(self, rng):
        fb, Rs, ps = _make_factors(rng, W=5, F=30, n_per=60, noise=0.001)
        mask = jnp.ones(5)
        # perturb all but frame 0 (gauge)
        key = jax.random.PRNGKey(0)
        dr = jax.random.normal(key, (5, 3)) * 0.03
        dp = jax.random.normal(key, (5, 3)) * 0.1
        dr = dr.at[0].set(0)
        dp = dp.at[0].set(0)
        Rs_b = Rs @ so3.exp(dr)
        ps_b = ps + dp
        r_before = float(lf.cost(fb, Rs_b, ps_b, mask))
        Rs_o, ps_o, H, r0, r1, conv = opt.lm_lidar(Rs_b, ps_b, fb, mask,
                                                   max_iter=25)
        assert float(r1) < 0.05 * r_before, (float(r1), r_before)
        # pose error vs truth (up to gauge = frame 0 fixed, shared)
        perr = np.linalg.norm(np.asarray(ps_o - ps), axis=-1)
        assert perr.max() < 0.005, perr

    def test_jit_compiles(self, rng):
        fb, Rs, ps = _make_factors(rng, W=3, F=5)
        mask = jnp.ones(3)
        f = jax.jit(lambda *a: opt.lm_lidar(*a, max_iter=2))
        out1 = f(Rs, ps, fb, mask)
        out2 = f(Rs, ps, fb, mask)
        assert np.allclose(np.asarray(out1[1]), np.asarray(out2[1]))


class TestLMLI:
    def _window(self, rng, W=5):
        """Simulated window: true states + preints + plane factors."""
        traj = sim.make_trajectory(duration=2.0, speed=1.5, wobble=0.4)
        t_scans = 0.2 + 0.1 * np.arange(W)
        states = []
        for t in t_scans:
            R, p, v = traj.state_at(t)
            s = NavState.identity()
            s = dataclasses.replace(
                s, R=jnp.array(R, jnp.float32), p=jnp.array(p, jnp.float32),
                v=jnp.array(v, jnp.float32), t=jnp.array(t, jnp.float32))
            states.append(s)
        states = jax.tree.map(lambda *x: jnp.stack(x), *states)

        preints = []
        for i in range(W - 1):
            ts, gyr, acc = sim.imu_stream(traj, rate=200.0, t0=t_scans[i],
                                          t1=t_scans[i + 1] + 1e-4)
            g = 0.5 * (gyr[:-1] + gyr[1:]).astype(np.float32)
            a = 0.5 * (acc[:-1] + acc[1:]).astype(np.float32)
            dt = np.diff(ts).astype(np.float32)
            preints.append(pre.integrate(
                jnp.array(g), jnp.array(a), jnp.array(dt), jnp.ones(len(dt)),
                jnp.zeros(3), jnp.zeros(3), jnp.eye(6) * 1e-4, jnp.eye(6) * 1e-6))
        preints = jax.tree.map(lambda *x: jnp.stack(x), *preints)

        # plane factors from the room, expressed in body frames
        normals, dsp = sim.box_room()
        wins, fixes = [], []
        for pi in range(len(normals)):
            frame_cl = []
            for i in range(W):
                R, p, _ = traj.state_at(t_scans[i])
                uv = rng.uniform(-2, 2, (50, 2))
                nrm = normals[pi]
                t1v = np.cross(nrm, [0.3, 0.7, 0.2])
                t1v /= np.linalg.norm(t1v)
                t2v = np.cross(nrm, t1v)
                base = -dsp[pi] * nrm
                pts_w = base + uv[:, :1] * t1v + uv[:, 1:] * t2v
                pts_w += nrm * rng.normal(0, 0.002, (50, 1))
                pts_l = (pts_w - p) @ R
                frame_cl.append(cl.from_points(jnp.array(pts_l, jnp.float32)))
            wins.append(jax.tree.map(lambda *x: jnp.stack(x), *frame_cl))
            fixes.append(cl.Cluster.empty())
        win = jax.tree.map(lambda *x: jnp.stack(x), *wins)
        fix = jax.tree.map(lambda *x: jnp.stack(x), *fixes)
        F = len(normals)
        fb = lf.FactorBatch(win=win, fix=fix, coeff=jnp.ones(F),
                            valid=jnp.ones(F, bool))
        return states, preints, fb

    @pytest.mark.slow
    def test_li_reduces_residual_and_error(self, rng):
        W = 5
        states, preints, fb = self._window(rng, W)
        mask = jnp.ones(W)
        # perturb states (not frame 0)
        key = jax.random.PRNGKey(1)
        dx = jax.random.normal(key, (W, 15)) * 0.02
        dx = dx.at[0].set(0).at[:, 9:].set(0)
        bad = states.boxplus(dx)
        out, H, r0, r1, conv = opt.lm_li(bad, fb, preints, mask, max_iter=8)
        assert float(r1) < float(r0), (float(r0), float(r1))
        p_err_before = np.linalg.norm(np.asarray(bad.p - states.p), axis=-1).max()
        p_err_after = np.linalg.norm(np.asarray(out.p - states.p), axis=-1).max()
        assert p_err_after < 0.5 * p_err_before, (p_err_before, p_err_after)

    @pytest.mark.slow
    def test_li_gravity_variant_runs(self, rng):
        W = 4
        states, preints, fb = self._window(rng, W)
        mask = jnp.ones(W)
        out, H, r0, r1, conv = opt.lm_li_gravity(states, fb, preints, mask,
                                                 max_iter=3)
        assert H.shape == (W * 15 + 3, W * 15 + 3)
        assert np.all(np.isfinite(np.asarray(out.g)))
        assert float(r1) <= float(r0) * 1.001
