"""Trace the front+iekf+insert interleaved loop and summarize device
busy/idle from the trace-viewer JSON."""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    import dataclasses
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
        LocalBAConfig
    from voxelslam_tpu.core.state import NavState, stack_states
    from voxelslam_tpu.map import voxel_map as vm
    from voxelslam_tpu.imu import ekf, preintegration as pre
    from voxelslam_tpu.odom import iekf
    from voxelslam_tpu.ops.downsample import voxel_downsample

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024))
    W = cfg.lba.win_size
    ocfg = cfg.odom
    N, M = 4096, 64
    rng = np.random.default_rng(0)
    nm = jnp.diag(jnp.array([cfg.lba.noise_gyr] * 3
                            + [cfg.lba.noise_acc] * 3, jnp.float32))
    nw = jnp.diag(jnp.array([cfg.lba.walk_gyr] * 3
                            + [cfg.lba.walk_acc] * 3, jnp.float32))

    def front(state, preints, imu_blob, scan_blob, scal):
        imu_ts, gyr, acc, imask = (imu_blob[:, 0], imu_blob[:, 1:4],
                                   imu_blob[:, 4:7], imu_blob[:, 7])
        p_, off, pm = scan_blob[:, 0:3], scan_blob[:, 3], scan_blob[:, 4]
        covd = lambda v: jnp.full((3,), v, jnp.float32)
        stp, poses = ekf.propagate(
            state, imu_ts, gyr, acc, imask, scal[0], scal[1], scal[2],
            covd(ocfg.cov_gyr), covd(ocfg.cov_acc),
            covd(ocfg.cov_bias_gyr), covd(ocfg.cov_bias_acc))
        des = ekf.deskew(p_, off, poses, stp, jnp.eye(3), jnp.zeros(3))
        down, dmask, _ = voxel_downsample(des, pm, ocfg.down_size, N)
        dmask = dmask.astype(jnp.float32)
        var_b = iekf.point_var_body(down, ocfg.dept_err, ocfg.beam_err)
        trd = jnp.einsum("nii->n", var_b) / 3.0
        g_mid = 0.5 * (gyr[:-1] + gyr[1:])
        a_mid = 0.5 * (acc[:-1] + acc[1:])
        dtp = jnp.full((M - 1,), 0.005)
        p_new = pre.integrate(g_mid, a_mid, dtp, imask[1:], stp.bg, stp.ba,
                              nm, nw)
        preints2 = jax.tree.map(
            lambda a, b: jnp.concatenate([a[1:], b[None]], 0),
            preints, p_new)
        return stp, down, dmask, var_b, trd, preints2

    j_front = jax.jit(front)

    @jax.jit
    def j_iekf(x_prop, levels, down, var_b, dmask):
        return iekf.iekf_update(x_prop, levels, cfg.map, down, var_b, dmask,
                                max_iter=ocfg.max_iter,
                                degrade_eig=ocfg.degrade_eig)

    j_insert = jax.jit(
        lambda levels, st, down, tr, dmask, mp, jour: vm.insert_scan(
            levels, cfg.map, down @ st.R.T + st.p, down, tr, dmask,
            mp[W - 1], jour))

    imu_np = rng.random((M, 8)).astype(np.float32)
    imu_np[:, 0] = 1.0 + np.arange(M) * 0.005
    imu_np[:, 7] = 1.0
    pts_np = np.stack([rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
                       rng.normal(0.5, 0.01, N)], -1).astype(np.float32)
    scan_np = np.concatenate([pts_np, np.zeros((N, 1), np.float32),
                              np.ones((N, 1), np.float32)], 1)
    imu_blob = jnp.array(imu_np)
    scan_blob = jnp.array(scan_np)
    scal = jnp.array([1.0, 1.1, 1.0, 0.0], jnp.float32)
    pts_c = jnp.array(pts_np)
    tr_c = jnp.full((N,), 1e-4)
    mask_c = jnp.ones(N)
    var_c = iekf.point_var_body(pts_c, ocfg.dept_err, ocfg.beam_err)

    levels = vm.empty_map(cfg.map)
    mp = jnp.arange(W, dtype=jnp.int32)
    st0 = NavState.identity()
    for s in range(W):
        levels = j_insert(levels, st0, pts_c, tr_c, mask_c,
                          jnp.roll(mp, W - 1 - s), 0.0)
    win = stack_states([NavState.identity() for _ in range(W)])
    levels = jax.jit(lambda lv, w, m: vm.refresh_planes(
        lv, cfg.map, w.R, w.p, m, W))(levels, win, mp)
    state = dataclasses.replace(NavState.identity(), cov=jnp.eye(15) * 1e-2)
    g1 = jnp.array(rng.normal(0, 0.01, (M - 1, 3)), jnp.float32)
    a1 = jnp.zeros((M - 1, 3)) + jnp.array([0, 0, 9.81])
    p_one = pre.integrate(g1, a1, jnp.full((M - 1,), 0.005),
                          jnp.ones((M - 1,)), jnp.zeros(3), jnp.zeros(3),
                          nm, nw)
    preints = jax.tree.map(lambda a: jnp.stack([a] * (W - 1)), p_one)
    jax.block_until_ready((levels, preints))

    def v1(c):
        state, preints, levels = c
        out = j_front(state, preints, imu_blob, scan_blob, scal)
        preints = out[5]
        st2, ok, diag = j_iekf(state, levels, pts_c, var_c, mask_c)
        levels = j_insert(levels, st0, pts_c, tr_c, mask_c, mp, 0.0)
        return state, preints, levels

    c = (state, preints, levels)
    for _ in range(3):
        c = v1(c)
    jax.block_until_ready(c)

    trace_dir = "/tmp/v1_trace"
    with jax.profiler.trace(trace_dir):
        t0 = time.time()
        for _ in range(10):
            c = v1(c)
        jax.block_until_ready(c)
        wall = time.time() - t0
    print(f"traced wall: {wall/10*1e3:.2f} ms/iter")

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from xplane_summary import summarize
    summarize(trace_dir, n_iters=10)


if __name__ == "__main__":
    main()
