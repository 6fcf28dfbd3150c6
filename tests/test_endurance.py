"""Endurance: 1000+ scans through the FULL system (VERDICT r3 #6).

One continuous run exercising loop closures, periodic eviction, a
mid-run session reset, a checkpoint save+restore, and streaming
distributed GBA — asserting the properties that make long multi-session
runs feasible:

  * bounded memory: RSS growth over the steady phase stays small
  * bounded error: final positions track ground truth
  * compile stability: ZERO XLA compiles in the steady tail (the r3
    pose-graph pow2 churn failed exactly this), and the condensed
    pose-graph solver compiles at most 2 capacity variants all run
"""

import dataclasses
import logging
import os
import tempfile

import numpy as np
import pytest

from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
    LocalBAConfig, LoopConfig, GBAConfig
from voxelslam_tpu.io import simulator as sim


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                return float(line.split()[1]) / 1024.0
    return 0.0


class _CompileCounter(logging.Handler):
    """Counts XLA compile events via jax_log_compiles messages."""

    def __init__(self):
        super().__init__(level=logging.DEBUG)
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        if "ompil" in msg:      # "Compiling ..." / "Finished XLA compilation"
            self.events.append(msg)


@pytest.mark.slow
def test_endurance_1000_scans():
    import jax
    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 11, 1 << 12, 1 << 12),
                      unique_max=(1024, 1024, 2048),
                      evict_check_every=50, evict_load=0.3,
                      evict_dist=60.0),
        odom=OdometryConfig(point_max=1024, imu_max=64),
        lba=LocalBAConfig(factor_max=256),
        loop=LoopConfig(jud_default=0.3, curr_halt=3),
        gba=GBAConfig(win_size=4, stride=2, voxel_size=2.0,
                      total_max_iter=2),
    )
    from voxelslam_tpu.pipeline.system import SlamSystem

    n_scans = 1000
    warm = 420          # init + first {BA, evict, keyframe, PGO, GBA
    #                     flush, reset re-init, checkpoint reload}
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.1, wobble=0.2, yaw_rate=0.35,
                               ramp=1.2)
    scene = sim.make_scene(half_extent=(14.0, 12.0, 3.5),
                           center=(4.0, 0.0, 1.0), pillars=8)

    import jax.numpy as jnp

    def _warm_evict(s):
        # one-time compiles whose first REAL trigger is data-dependent
        # (eviction: table load crossing; keyframe reload: first
        # nearby_keyframe hit) — force them during warmup, like
        # bench.py, so the steady tail stays compile-free
        occ = s.odom._jit_occ_counts(s.odom.levels)
        lv, _ = s.odom._jit_evict(s.odom.levels,
                                  jnp.float32(s.odom.jour))
        P = s.loop.kf_point_max
        lv2 = s.odom._jit_push_fixed_refresh(
            s.odom.levels, jnp.zeros((P, 3), jnp.float32),
            jnp.zeros((P,), jnp.float32), s.odom.jour,
            s.odom.win, s.odom.mp, jnp.int32(s.odom.win_count))
        jax.block_until_ready((occ, lv, lv2))

    sysm = SlamSystem(cfg, enable_loop=True, enable_gba=True)
    sysm.loop.dense_anchor_max = 0     # condensed pose graph only

    counter = _CompileCounter()
    jax.config.update("jax_log_compiles", True)
    jlog = logging.getLogger("jax")
    jlog.addHandler(counter)
    # keep the (very chatty) compile logs out of pytest's in-memory log
    # capture — with propagation on, the captured records dominated RSS
    # and masked the actual (flat) steady-state memory profile
    prev_prop = jlog.propagate
    jlog.propagate = False

    rss_mid = None
    errs_tail = []
    tmp = tempfile.mkdtemp()
    ck = os.path.join(tmp, "endurance.ckpt")
    try:
        t = 0.1
        for k in range(n_scans):
            scan = sim.lidar_scan(traj, t, t + 0.1, scene, None,
                                  n_az=72, n_el=12, noise=0.01, seed=k)
            hit = scan["hit"]
            ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
            gyr = np.empty((len(ts), 3))
            acc = np.empty((len(ts), 3))
            for i, ti in enumerate(ts):
                gyr[i], acc[i] = traj.imu_at(ti)
            sysm.process_scan(scan["points"][hit], scan["offsets"][hit],
                              ts, gyr, acc, t, t + 0.1)
            t += 0.1

            if k == 300:
                # forced divergence recovery: new session mid-run
                sysm.odom.reset(session=sysm.odom.session + 1)
            if k in (350, 700):
                # explicit PGO bursts: the simulated odometry is too
                # accurate to trip the reference's drift-ratio gates
                # (drift_p > 0.10), so exercise the solve + write-back
                # + live-map rebuild directly — once inside warmup
                # (compiles allowed), once in the steady tail (only a
                # pose-graph capacity growth may compile)
                if sysm.loop.scan_poses and \
                        len(sysm.loop.scan_poses[sysm.loop.cur_session]) > 20:
                    c = sysm.loop._optimize(g_update=False)
                    sysm.odom.apply_correction(
                        c.dx_R, c.dx_p, c.g_update, c.map_keyframes)
            if k == 360:
                # mid-run checkpoint: save, restore into a fresh
                # system, continue with the restored one
                sysm.save_checkpoint(ck)
                sysm2 = SlamSystem(cfg, enable_loop=True,
                                   enable_gba=True)
                sysm2.loop.dense_anchor_max = 0
                sysm2.load_checkpoint(ck)
                sysm = sysm2
            if k == warm - 1:
                _warm_evict(sysm)
            if k == warm:
                counter.events.clear()
                rss_mid = _rss_mb()
            if k > warm and sysm.odom.init_done:
                _, p_t, _ = traj.state_at(t - 0.05)
                errs_tail.append(np.linalg.norm(
                    np.asarray(sysm.odom.x.p) - p_t))
        # steady-state metrics close BEFORE finish(): the one-time final
        # global refinement legitimately compiles new (larger) window-BA
        # shapes and allocates total-BA buffers — that is final-phase
        # work (the reference's finish-triggered GBA), not steady growth
        rss_end = _rss_mb()
        steady_events = list(counter.events)
        n_pg_keys = len(sysm.loop._pg_cache)
        n_poses_before = sum(len(s) for s in sysm.loop.scan_poses)
        sysm.finish()
        assert sum(len(s) for s in sysm.loop.scan_poses) >= n_poses_before
        assert len(sysm.gba.submaps) > 0 and len(sysm.gba.edges1) > 0
    finally:
        jlog.removeHandler(counter)
        jlog.propagate = prev_prop
        jax.config.update("jax_log_compiles", False)

    errs_tail = np.asarray(errs_tail)

    # bounded memory: fixed-capacity tables + ring buffers mean the
    # steady phase cannot grow meaningfully (scan-pose metadata only)
    assert rss_end - rss_mid < 400.0, (rss_mid, rss_end)
    # bounded error (the room is ~28 m across; odometry alone drifts)
    assert np.sqrt((errs_tail ** 2).mean()) < 1.5, \
        np.sqrt((errs_tail ** 2).mean())
    # compile stability: the steady tail (post-warm 580 scans incl. any
    # later PGO bursts / GBA flushes / evictions) recompiles NOTHING
    # except at most one pose-graph capacity growth. Sub-10ms
    # convert_element_type compiles are array-constant conversions that
    # accompany the new pad shapes of that growth — constant-folding
    # noise, not executable churn.
    compiling = [e for e in steady_events if e.startswith("Compiling ")]
    pg_compiles = [e for e in compiling if "solve_pose_graph" in e]
    others = [e for e in compiling
              if "solve_pose_graph" not in e
              and "jit(convert_element_type)" not in e]
    assert len(others) == 0, others[:5]
    # capacity-ladder keys during the scan loop (finish()'s one-time
    # top-down solve over the full GBA edge set adds its own key)
    assert n_pg_keys <= 2, list(sysm.loop._pg_cache)
    assert len(pg_compiles) <= 2, pg_compiles
