"""Instrumented run of the elevator scenario (tests/test_elevator.py A)
to see session/reset/correction timing scan by scan."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax

jax.config.update("jax_platforms", "cpu")
cache = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
    LocalBAConfig, LoopConfig  # noqa: E402
from voxelslam_tpu.io import simulator as sim  # noqa: E402
from voxelslam_tpu.pipeline.system import SlamSystem  # noqa: E402
from tests.test_elevator import _room_scene, _run  # noqa: E402

cfg = SlamConfig(
    map=MapConfig(capacities=(1 << 11, 1 << 12, 1 << 12),
                  unique_max=(1024, 1024, 2048)),
    odom=OdometryConfig(point_max=4096, imu_max=64),
    lba=LocalBAConfig(factor_max=256),
    loop=LoopConfig(jud_default=0.45),
)
scene = _room_scene()
import sys as _sys
if "--short" in _sys.argv:
    legs = [(2 * np.pi / 0.7, 0.7), (10.0, 0.0),
            (np.pi / 0.9, 0.9), (12.0, 0.0), (10.0, 0.55)]
else:
    legs = [(2 * np.pi / 0.7, 0.7), (30.0, 0.0),
            (np.pi / 0.9, 0.9), (34.0, 0.0), (12.0, 0.55)]
traj = sim.make_waypoint_trajectory(legs, speed=1.5, still=0.4,
                                    ramp=1.0, wobble=0.0, z_amp=0.04)
sysm = SlamSystem(cfg, enable_loop=True, enable_gba=False)
n_scans = int((sum(d for d, _ in legs) - 1.0) / 0.1)

t = 0.1
last_sess = 0
last_phase = None
for k in range(n_scans):
    scan = sim.lidar_scan(traj, t, t + 0.1, scene, None, n_az=160,
                          n_el=20, noise=0.012, seed=k, max_range=25.0)
    hit = scan["hit"]
    ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
    gyr = np.empty((len(ts), 3))
    acc = np.empty((len(ts), 3))
    for i, ti in enumerate(ts):
        gyr[i], acc[i] = traj.imu_at(ti)
    out = sysm.process_scan(scan["points"][hit], scan["offsets"][hit],
                            ts, gyr, acc, t, t + 0.1)
    ph = out.get("phase")
    _, p_gt, _ = traj.state_at(t + 0.05)
    if (ph != last_phase or sysm.odom.session != last_sess
            or out.get("loop_correction") or k % 50 == 0
            or (sysm.odom.session >= 1 and ph == "odom")):
        err = np.linalg.norm(np.asarray(sysm.odom.x.p) - p_gt)
        print(f"k={k:4d} t={t:6.1f} phase={ph:12s} sess={sysm.odom.session:3d} "
              f"hits={int(hit.sum()):5d} gt={np.round(p_gt,1)} "
              f"err={err:7.2f} corr={sysm.corrections} "
              f"edges={len(sysm.loop.lp_edges)} "
              f"graph={sysm.loop.graph_ids} "
              f"ok={out.get('ok')} m={out.get('matches')} "
              f"eig={out.get('nnt_eig0') if out.get('nnt_eig0') is None else round(out.get('nnt_eig0'),1)} "
              f"dcnt={sysm.odom.degrade_cnt}", flush=True)
    last_phase, last_sess = ph, sysm.odom.session
    t += 0.1
print("final session", sysm.odom.session, "corrections", sysm.corrections)
cross = [(e.id_a, e.id_b) for e in sysm.loop.lp_edges if e.id_a != e.id_b]
print("cross edges", cross)
# edge accuracy vs ground truth: LoopEdge convention x_a o T = x_b
for e in sysm.loop.lp_edges:
    try:
        ta = sysm.loop.scan_poses[e.id_a][e.ord_a].t
        tb = sysm.loop.scan_poses[e.id_b][e.ord_b].t
    except IndexError:
        continue
    Ra, pa, _ = traj.state_at(ta - 0.05)
    Rb, pb, _ = traj.state_at(tb - 0.05)
    R_gt = Ra.T @ Rb
    t_gt = Ra.T @ (pb - pa)
    print(f"edge ({e.id_a},{e.ord_a})->({e.id_b},{e.ord_b}) "
          f"R_err={np.linalg.norm(e.R - R_gt):.3f} "
          f"t_err={np.linalg.norm(e.t - t_gt):.3f} t={np.round(e.t,2)} "
          f"t_gt={np.round(t_gt,2)}")
