"""Per-stage device timing of the steady-state scan step.

Times each megastep component in isolation on the current backend:
prop+deskew, downsample, preintegrate, iekf, insert, refresh, harvest,
lm_li, marginalize. Run after tools/profile_scan.py (shares the compile
cache).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def enable_cache():
    import jax
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def timeit(name, fn, *args, reps=10):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out


def main():
    enable_cache()
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, LocalBAConfig
    from voxelslam_tpu.pipeline import SlamPipeline
    from voxelslam_tpu.io import simulator as sim
    from voxelslam_tpu.map import voxel_map as vm
    from voxelslam_tpu.ba import optimizers as opt
    from voxelslam_tpu.odom import iekf

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    W = cfg.lba.win_size
    n_scans = 14
    traj = sim.make_trajectory(duration=0.2 + 0.1 * (n_scans + 2),
                               speed=1.2, wobble=0.25, yaw_rate=0.3, ramp=1.2)
    normals, dsp = sim.box_room(half_extent=(14.0, 12.0, 3.5),
                                center=(4.0, 0.0, 1.0))
    pipe = SlamPipeline(cfg, collect_clouds=False)
    t = 0.1
    for k in range(n_scans):
        scan = sim.lidar_scan(traj, t, t + 0.1, normals, dsp,
                              n_az=160, n_el=24, noise=0.01, seed=k)
        hit = scan["hit"]
        ts = np.arange(t - 0.01, t + 0.1 + 1e-6, 1.0 / 200.0)
        gyr = np.empty((len(ts), 3))
        acc = np.empty((len(ts), 3))
        for i, ti in enumerate(ts):
            gyr[i], acc[i] = traj.imu_at(ti)
        pipe.process_scan(scan["points"][hit], scan["offsets"][hit],
                          ts, gyr, acc, t, t + 0.1)
        t += 0.1
    assert pipe.init_done, "init did not finish"
    print("pipeline warm", flush=True)

    levels, win, mp, preints = pipe.levels, pipe.win, pipe.mp, pipe.preints_dev
    pts = jnp.array(pipe.scan_buf[W - 2])
    mask = jnp.array(pipe.scan_mask[W - 2])
    tr = jnp.array(pipe.scan_tr[W - 2])
    var_b = iekf.point_var_body(pts, cfg.odom.dept_err, cfg.odom.beam_err)
    state = pipe.x

    j_insert = jax.jit(lambda lv, p, m, t_: vm.insert_scan(
        lv, cfg.map, p, p, t_, m, 3))
    j_refresh = jax.jit(lambda lv, w, m: vm.refresh_planes(
        lv, cfg.map, w.R, w.p, m, W))
    j_iekf = jax.jit(lambda s, lv, p, vb, m: iekf.iekf_update(
        s, lv, cfg.map, p, vb, m, max_iter=cfg.odom.max_iter))
    j_harvest = jax.jit(lambda lv, m: vm.harvest(lv, cfg.map, m,
                                                 cfg.lba.factor_max))
    j_marg = jax.jit(lambda lv, w, m: vm.marginalize(
        lv, cfg.map, w.R, w.p, m, W, 1))
    j_lm = jax.jit(lambda w, f, p: opt.lm_li(
        w, f, p, jnp.ones((W,)), imu_coef=cfg.lba.imu_coef,
        max_iter=cfg.lba.max_iter))
    from voxelslam_tpu.ba import lidar_factor as lf
    j_hg = jax.jit(lambda f, w: lf.hess_grad(f, w.R, w.p, jnp.ones((W,))))
    j_cost = jax.jit(lambda f, w: lf.cost(f, w.R, w.p, jnp.ones((W,))))

    timeit("insert_scan", j_insert, levels, pts, mask, tr)
    lv2 = timeit("refresh_planes", j_refresh, levels, win, mp)
    timeit("iekf_update(4 iters)", j_iekf, state, lv2, pts, var_b, mask)
    factors = timeit("harvest", j_harvest, lv2, mp)
    timeit("lidar hess_grad", j_hg, factors, win)
    timeit("lidar cost", j_cost, factors, win)
    timeit("lm_li (3 iters)", j_lm, win, factors, preints)
    timeit("marginalize", j_marg, lv2, win, mp)


if __name__ == "__main__":
    main()
