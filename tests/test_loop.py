"""Loop closure: BTC descriptors, ICP, pose graph, LoopPipeline.

The reference validates loop closure only by eye (SURVEY.md section 4);
here each stage gets a quantitative test on simulated geometry: place
recognition must recover the true relative pose between two visits, ICP
must refine it, and the pose-graph burst must bend a drifted trajectory
back onto the loop constraint.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from voxelslam_tpu.io import simulator as sim
from voxelslam_tpu.loop.btc import BtcConfig, DescriptorDB, extract
from voxelslam_tpu.loop.icp import icp_point_to_plane
from voxelslam_tpu.loop import posegraph as pg
from voxelslam_tpu.ops.downsample import voxel_downsample

P = 16384


@pytest.fixture(scope="module")
def scene():
    return sim.make_scene()


def keyframe_cloud(scene, origin, yaw, seed, n_az=180, n_el=24):
    """Merged multi-scan keyframe cloud in the body frame of
    (yaw, origin) — mimics the pipeline's keyframe creation."""
    rng = np.random.default_rng(seed)
    R0 = np.array([[np.cos(yaw), -np.sin(yaw), 0],
                   [np.sin(yaw), np.cos(yaw), 0],
                   [0, 0, 1.0]])
    pts = []
    for _ in range(10):
        p = np.asarray(origin) + rng.normal(0, 0.3, 3) * [1, 1, 0.1]
        dirs, _ = sim.scan_directions(n_az, n_el)
        pc, hit = sim.raycast(p, R0, dirs, scene)
        w = pc[hit] @ R0.T + p
        pts.append(w + rng.normal(0, 0.01, w.shape))
    W = np.concatenate(pts)
    body = (W - np.asarray(origin)) @ R0
    down, dmask, _ = voxel_downsample(
        jnp.array(body, jnp.float32), jnp.ones(len(body), jnp.float32),
        0.2, P)
    return (np.asarray(down), np.asarray(dmask, np.float32), R0,
            np.asarray(origin, np.float64))


@pytest.fixture(scope="module")
def two_visits(scene):
    kfA = keyframe_cloud(scene, (0.0, 0.0, 1.0), 0.0, 1)
    kfB = keyframe_cloud(scene, (1.0, -1.5, 1.0), 0.7, 9)
    return kfA, kfB


class TestBtc:
    @pytest.mark.slow
    def test_descriptors_extracted(self, two_visits):
        (cA, mA, _, _), _ = two_visits
        d = extract(jnp.array(cA), jnp.array(mA), BtcConfig())
        assert int(np.asarray(d["tri_valid"]).sum()) > 20
        assert int(np.asarray(d["plane_valid"]).sum()) >= 6

    @pytest.mark.slow
    def test_revisit_recovers_transform(self, two_visits):
        (cA, mA, RA, pA), (cB, mB, RB, pB) = two_visits
        cfg = BtcConfig()
        dA = {k: np.asarray(v) for k, v in
              extract(jnp.array(cA), jnp.array(mA), cfg).items()}
        dB = {k: np.asarray(v) for k, v in
              extract(jnp.array(cB), jnp.array(mB), cfg).items()}
        db = DescriptorDB(cfg)
        db.add(0, dA)
        cands = db.search(dB, skip_near=-1, current_frame=1 << 30)
        assert cands, "revisit not retrieved"
        ver = db.verify(dB, cands[0][0], cands[0][2])
        assert ver is not None, "geometric verification failed"
        R_t = RA.T @ RB                   # true cur-body -> matched-body
        t_t = RA.T @ (pB - pA)
        assert np.abs(ver["R"] - R_t).max() < 0.05
        assert np.linalg.norm(ver["t"] - t_t) < 0.3
        assert ver["overlap"] > 0.4

    def test_no_match_for_disjoint_place(self, scene, two_visits):
        (cA, mA, _, _), _ = two_visits
        cfg = BtcConfig()
        dA = {k: np.asarray(v) for k, v in
              extract(jnp.array(cA), jnp.array(mA), cfg).items()}
        far = keyframe_cloud(scene, (12.0, 8.0, 1.0), 2.2, 5)
        dF = {k: np.asarray(v) for k, v in
              extract(jnp.array(far[0]), jnp.array(far[1]), cfg).items()}
        db = DescriptorDB(cfg)
        db.add(0, dA)
        cands = db.search(dF, skip_near=-1, current_frame=1 << 30)
        for f, votes, matches in cands[:3]:
            ver = db.verify(dF, f, matches)
            if ver is not None:
                # allow retrieval but demand low overlap confidence
                assert ver["overlap"] < 0.4


class TestIcp:
    @pytest.mark.slow
    def test_refines_coarse_transform(self, two_visits):
        (cA, mA, RA, pA), (cB, mB, RB, pB) = two_visits
        R_t = RA.T @ RB
        t_t = RA.T @ (pB - pA)
        # perturb the true transform and let ICP pull it back
        dR = np.array(sim._exp(np.array([0.02, -0.03, 0.04])))
        R0 = R_t @ dR
        t0 = t_t + np.array([0.15, -0.1, 0.1])
        out = icp_point_to_plane(
            jnp.array(cB), jnp.array(mB), jnp.array(cA), jnp.array(mA),
            jnp.array(R0, jnp.float32), jnp.array(t0, jnp.float32))
        assert bool(out["ok"])
        assert np.abs(np.asarray(out["R"]) - R_t).max() < 0.01
        assert np.linalg.norm(np.asarray(out["t"]) - t_t) < 0.05


class TestPoseGraph:
    def test_loop_edge_corrects_drift(self, rng):
        # circle trajectory with accumulated yaw-rate bias, loop closed
        K = 60
        th = np.linspace(0, 2 * np.pi, K)
        gt_p = np.stack([5 * np.sin(th), 5 * (1 - np.cos(th)),
                         np.zeros(K)], -1)
        gt_R = np.stack([np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1]]) for a in th])
        # drifted odometry: relative poses with a small yaw bias
        est_R = [gt_R[0]]
        est_p = [gt_p[0]]
        bias = np.array(sim._exp(np.array([0, 0, 0.004])))
        for i in range(1, K):
            rel_R = gt_R[i - 1].T @ gt_R[i] @ bias
            rel_p = gt_R[i - 1].T @ (gt_p[i] - gt_p[i - 1])
            est_R.append(est_R[-1] @ rel_R)
            est_p.append(est_p[-1] + est_R[-2] @ rel_p)
        est_R = np.stack(est_R)
        est_p = np.stack(est_p)
        drift0 = np.linalg.norm(est_p[-1] - gt_p[-1])
        assert drift0 > 0.5  # the scenario actually drifts

        ii, jj, rel_R, rel_p, info = pg.odometry_chain_edges(
            jnp.array(est_R, jnp.float32), jnp.array(est_p, jnp.float32),
            jnp.ones((K, 6)) * 1e-4)
        # loop edge: first -> last with the TRUE relative pose
        lR = gt_R[0].T @ gt_R[-1]
        lp = gt_R[0].T @ (gt_p[-1] - gt_p[0])
        ii = jnp.concatenate([ii, jnp.array([0], jnp.int32)])
        jj = jnp.concatenate([jj, jnp.array([K - 1], jnp.int32)])
        rel_R = jnp.concatenate([rel_R, jnp.array(lR, jnp.float32)[None]])
        rel_p = jnp.concatenate([rel_p, jnp.array(lp, jnp.float32)[None]])
        info = jnp.concatenate([info, jnp.full((1, 6), 1e6)])

        R2, p2, chi = pg.solve_pose_graph(
            jnp.array(est_R, jnp.float32), jnp.array(est_p, jnp.float32),
            ii, jj, rel_R, rel_p, info, iters=8)
        drift1 = float(np.linalg.norm(
            np.asarray(p2[-1]) - np.asarray(p2[0])
            - np.asarray(gt_p[-1] - gt_p[0])))
        assert drift1 < 0.2 * drift0


def _drifted_multisession(n_per_session, n_loop_edges, yaw_bias=0.002,
                          seed=0):
    """Sessions of drifted circle trajectories + loop edges carrying the
    TRUE relative poses; ground truth is shared so cross-session edges
    are consistent. Returns a populated LoopPipeline."""
    from voxelslam_tpu.config import small_test_config
    from voxelslam_tpu.pipeline.loop import LoopPipeline, LoopEdge
    from voxelslam_tpu.pipeline.odometry import ScanPose

    rng = np.random.default_rng(seed)
    lp = LoopPipeline(small_test_config())
    radius = 20.0
    total = sum(n_per_session)
    th_all = np.linspace(0, 4 * np.pi, total)
    gt_R_all, gt_p_all = [], []
    for a in th_all:
        gt_R_all.append(np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0],
             [0, 0, 1.0]]))
        gt_p_all.append(np.array([radius * np.sin(a),
                                  radius * (1 - np.cos(a)), 0.0]))
    bias = np.asarray(sim._exp(np.array([0, 0, yaw_bias])))
    k0 = 0
    for s, n_s in enumerate(n_per_session):
        lp.new_session()
        est_R = gt_R_all[k0].copy()
        est_p = gt_p_all[k0].copy()
        for i in range(n_s):
            k = k0 + i
            if i > 0:
                rel_R = gt_R_all[k - 1].T @ gt_R_all[k] @ bias
                rel_p = gt_R_all[k - 1].T @ (gt_p_all[k] - gt_p_all[k - 1])
                est_p = est_p + est_R @ rel_p
                est_R = est_R @ rel_R
            lp.scan_poses[s].append(ScanPose(
                t=0.1 * k, R=est_R.copy(), p=est_p.copy(),
                v=np.zeros(3), v6=np.full(6, 1e-4),
                cloud=np.zeros((2, 3), np.float32),
                cloud_mask=np.ones(2, np.float32), session=s))
        k0 += n_s
    # loop edges with TRUE relative poses between random scan pairs
    offsets = np.cumsum([0] + list(n_per_session))
    for _ in range(n_loop_edges):
        sa, sb = rng.integers(0, len(n_per_session), 2)
        oa = int(rng.integers(0, n_per_session[sa]))
        ob = int(rng.integers(0, n_per_session[sb]))
        ga, gb = offsets[sa] + oa, offsets[sb] + ob
        if ga == gb:
            continue
        rel_R = gt_R_all[ga].T @ gt_R_all[gb]
        rel_p = gt_R_all[ga].T @ (gt_p_all[gb] - gt_p_all[ga])
        lp.lp_edges.append(LoopEdge(
            id_a=int(sa), id_b=int(sb), ord_a=oa, ord_b=ob,
            R=rel_R, t=rel_p, v6=np.full(6, 1e-6)))
    lp.graph_ids = list(range(len(n_per_session)))
    return lp, gt_R_all, gt_p_all, offsets


def _ate(lp, gt_p_all, offsets):
    err = []
    for s in range(len(lp.scan_poses)):
        for i, sp in enumerate(lp.scan_poses[s]):
            err.append(np.linalg.norm(sp.p - gt_p_all[offsets[s] + i]))
    return float(np.sqrt(np.mean(np.square(err))))


def _loop_resid(lp):
    """Mean translation residual over the loop constraints — the
    quantity a PGO burst must drive to ~zero."""
    r = []
    for e in lp.lp_edges:
        a = lp.scan_poses[e.id_a][e.ord_a]
        b = lp.scan_poses[e.id_b][e.ord_b]
        r.append(np.linalg.norm(a.R.T @ (b.p - a.p) - e.t))
    return float(np.mean(r))


class TestCondensedPoseGraph:
    """Anchor condensation (loop/condense.py) vs the dense all-scans GN:
    both must bend the drifted trajectory back; at small scale they must
    agree; at reference scale (20k scans, 3 sessions, 50 loop edges) the
    condensed path must run in seconds with a bounded anchor solve."""

    def test_condensed_matches_dense_small(self):
        lpd, gtR, gtp, offs = _drifted_multisession([60, 60], 6, seed=3)
        lpc, _, _, _ = _drifted_multisession([60, 60], 6, seed=3)
        r0 = _loop_resid(lpd)
        lpd.dense_anchor_max = 10 ** 9    # all scans are anchors
        lpc.dense_anchor_max = 0          # force condensation
        lpd._optimize(g_update=False)
        lpc._optimize(g_update=False)
        # both drive the loop constraints to ~zero
        assert _loop_resid(lpd) < 0.05 * r0
        assert _loop_resid(lpc) < 0.05 * r0
        # condensed interiors agree with the dense solution (chain
        # elimination is exact to first order; the geodesic-blend
        # interior recovery differs from the relinearized dense optimum
        # by O(drift^2) mid-segment — drift here is 1.5 m)
        diffs = [np.linalg.norm(a.p - b.p)
                 for s in range(2)
                 for a, b in zip(lpd.scan_poses[s], lpc.scan_poses[s])]
        assert max(diffs) < 0.25
        assert float(np.mean(diffs)) < 0.06
        # and ATE does not regress
        assert _ate(lpc, gtp, offs) < 1.02 * _ate(lpd, gtp, offs) + 0.05

    @pytest.mark.slow
    def test_pose_graph_scales_20k(self):
        """VERDICT r3 done-criterion: 20k scans / 3 sessions / 50 loop
        edges solves in seconds with bounded memory (the old dense GN
        would need a 98304^2 normal matrix)."""
        import time
        lp, gtR, gtp, offs = _drifted_multisession(
            [7000, 7000, 6000], 50, yaw_bias=0.0004, seed=1)
        r0 = _loop_resid(lp)
        t0 = time.time()
        lp._optimize(g_update=False)
        dt = time.time() - t0
        assert _loop_resid(lp) < 0.05 * r0
        # one bounded-size solver compile; anchors ~= 2*edges + ends
        (K, E), = lp._pg_cache.keys()
        assert K <= 256 and E <= 256
        assert dt < 120.0   # host: chain prefix + one small dense solve


class TestKeyframeConsumption:
    """Keyframe `exist` semantics: consumption is one-way (reference
    voxelslam.cpp:2602-2647 only ever clears exist, never re-arms), so
    a historical keyframe is folded into the live map at most once."""

    def _make_pipeline(self):
        from voxelslam_tpu.config import small_test_config
        from voxelslam_tpu.pipeline.loop import (LoopPipeline, Keyframe,
                                                 LoopEdge)
        from voxelslam_tpu.pipeline.odometry import ScanPose

        cfg = small_test_config()
        lp = LoopPipeline(cfg)
        lp.new_session()
        rng = np.random.default_rng(0)
        n_scans, n_kf = 14, 7
        for i in range(n_scans):
            p = np.array([0.1 * i, 0.0, 0.0])
            lp.scan_poses[0].append(ScanPose(
                t=0.1 * i, R=np.eye(3), p=p, v=np.zeros(3),
                v6=np.full(6, 1e-4), cloud=np.zeros((4, 3), np.float32),
                cloud_mask=np.ones(4, np.float32), session=0))
        for k in range(n_kf):
            lp.keyframes[0].append(Keyframe(
                kf_index=k, scan_id=2 * k, session=0,
                R0=np.eye(3), p0=np.array([0.2 * k, 0.0, 0.0]),
                cloud=np.zeros((4, 3), np.float32),
                mask=np.ones(4, np.float32), jour=0.2 * k))
        lp.lp_edges.append(LoopEdge(
            id_a=0, id_b=0, ord_a=0, ord_b=n_scans - 1, R=np.eye(3),
            t=np.array([0.1 * (n_scans - 1), 0, 0]),
            v6=np.full(6, 1e-6)))
        return lp

    def test_consumed_keyframes_stay_consumed(self):
        lp = self._make_pipeline()
        kfs = lp.keyframes[0]
        # keyframe 0 was reloaded by mid-term association earlier
        kfs[0].exist = False
        corr = lp._optimize(g_update=False)
        # last 5 consumed for the rebuild; kf 0 NOT re-armed
        assert all(not kf.exist for kf in kfs[-5:])
        assert not kfs[0].exist
        assert kfs[1].exist  # untouched older keyframe stays available
        consumed_before = {id(kf) for kf in kfs if not kf.exist}
        # a second PGO burst must not resurrect anything
        lp._optimize(g_update=False)
        assert {id(kf) for kf in kfs if not kf.exist} >= consumed_before
        assert not kfs[0].exist

    def test_nearby_keyframe_flat_cost_at_5k(self):
        """Radius query is vectorized over per-session position arrays
        (VERDICT r3 weak #5): per-scan cost must stay ~flat at
        thousands of keyframes, and stale positions after a PGO
        write-back must be re-synced."""
        import time
        from voxelslam_tpu.config import small_test_config
        from voxelslam_tpu.pipeline.loop import LoopPipeline, Keyframe
        lp = LoopPipeline(small_test_config())
        lp.new_session()
        n = 5000
        for k in range(n):
            lp.keyframes[0].append(Keyframe(
                kf_index=k, scan_id=k, session=0, R0=np.eye(3),
                p0=np.array([50.0 + 0.5 * k, 0.0, 0.0]),
                cloud=np.zeros((2, 3), np.float32),
                mask=np.ones(2, np.float32), jour=0.5 * k))
        lp.graph_ids = [0]
        # warm the lazy sync, then time 200 queries
        assert lp.nearby_keyframe(np.zeros(3), radius=1.0) is None
        t0 = time.time()
        for _ in range(200):
            lp.nearby_keyframe(np.array([1e6, 0, 0]), radius=10.0)
        dt = time.time() - t0
        assert dt < 1.0, f"200 queries over 5k keyframes took {dt:.2f}s"
        # a position update + invalidation is picked up
        lp.keyframes[0][123].p0 = np.array([-500.0, 0.0, 0.0])
        lp._kf_sync[0] = 0
        hit = lp.nearby_keyframe(np.array([-500.0, 0, 0]), radius=1.0)
        assert hit is lp.keyframes[0][123]

    def test_nearby_keyframe_consumes_once(self):
        lp = self._make_pipeline()
        lp.graph_ids = [0]
        p = np.array([0.0, 0.0, 0.0])
        first = lp.nearby_keyframe(p, radius=0.5)
        assert first is not None and not first.exist
        lp._optimize(g_update=False)   # PGO burst between reloads
        second = lp.nearby_keyframe(p, radius=0.5)
        # a different (not yet consumed) keyframe or none — never the
        # same object twice
        assert second is not first


class TestHighFlyProfile:
    """Aerial parameter profile (reference read_parameters isHighFly
    block, BTC.cpp:38-68) must actually change extraction behavior."""

    def test_profile_fields_differ(self):
        g = BtcConfig.profile(False)
        f = BtcConfig.profile(True)
        assert f.is_high_fly and not g.is_high_fly
        assert f.voxel_size > g.voxel_size          # 1->2 in the ref
        assert f.plane_eig_thr > g.plane_eig_thr    # 0.01->0.05
        assert f.merge_normal_dot < g.merge_normal_dot
        assert f.nms_radius > g.nms_radius          # 2->3
        assert f.min_side > g.min_side              # 2->3
        assert f.binary_thr < g.binary_thr          # 0.7->0.5

    def test_profiles_extract_differently(self, two_visits):
        (cloudA, maskA, _, _), _ = two_visits
        dg = extract(jnp.array(cloudA), jnp.array(maskA),
                     BtcConfig.profile(False))
        df = extract(jnp.array(cloudA), jnp.array(maskA),
                     BtcConfig.profile(True))
        sg = np.asarray(dg["sides"])[np.asarray(dg["tri_valid"])]
        sf = np.asarray(df["sides"])[np.asarray(df["tri_valid"])]
        assert len(sg) > 0
        # fly profile: longer minimum sides enforced
        if len(sf):
            assert sf[:, 0].min() >= 3.0 - 1e-5
        # descriptor sets differ (shape or content)
        assert sg.shape != sf.shape or not np.allclose(sg, sf)

    def test_preset_wires_profile(self):
        from voxelslam_tpu.config import preset
        from voxelslam_tpu.pipeline.loop import LoopPipeline
        lp_fly = LoopPipeline(preset("avia_fly"))
        lp_gnd = LoopPipeline(preset("avia"))
        assert lp_fly.btc_cfg.is_high_fly
        assert lp_fly.btc_cfg.voxel_size > lp_gnd.btc_cfg.voxel_size
