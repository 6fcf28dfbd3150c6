"""Prototype: the steady scan step as a chain of separately-jitted stage
calls (no outer megastep jit), with the stats fetch deferred one scan.
Measures steady-state wall per scan on the current backend.
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


def main():
    enable_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
        LocalBAConfig
    from voxelslam_tpu.core.state import NavState, stack_states, DIM
    from voxelslam_tpu.map import voxel_map as vm
    from voxelslam_tpu.imu import ekf, preintegration as pre
    from voxelslam_tpu.ba import optimizers as opt
    from voxelslam_tpu.odom import iekf
    from voxelslam_tpu.ops.downsample import voxel_downsample

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    W = cfg.lba.win_size
    mg = cfg.lba.mgsize
    rng = np.random.default_rng(0)
    N = cfg.odom.point_max
    M = cfg.odom.imu_max
    ocfg = cfg.odom

    nm = jnp.diag(jnp.array([cfg.lba.noise_gyr] * 3
                            + [cfg.lba.noise_acc] * 3, jnp.float32))
    nw = jnp.diag(jnp.array([cfg.lba.walk_gyr] * 3
                            + [cfg.lba.walk_acc] * 3, jnp.float32))
    R_ext = jnp.eye(3)
    t_ext = jnp.zeros(3)

    # --- stage jits -----------------------------------------------------
    @jax.jit
    def j_front(state, preints, imu_blob, scan_blob, scal):
        imu_ts, gyr, acc, imask = (imu_blob[:, 0], imu_blob[:, 1:4],
                                   imu_blob[:, 4:7], imu_blob[:, 7])
        pts, off, pm = scan_blob[:, 0:3], scan_blob[:, 3], scan_blob[:, 4]
        covd = lambda v: jnp.full((3,), v, jnp.float32)
        st, poses = ekf.propagate(
            state, imu_ts, gyr, acc, imask, scal[0], scal[1], scal[2],
            covd(ocfg.cov_gyr), covd(ocfg.cov_acc),
            covd(ocfg.cov_bias_gyr), covd(ocfg.cov_bias_acc))
        des = ekf.deskew(pts, off, poses, st, R_ext, t_ext)
        body = des @ R_ext.T + t_ext
        down, dmask, _ = voxel_downsample(body, pm, ocfg.down_size, N)
        dmask = dmask.astype(jnp.float32)
        var_b = iekf.point_var_body(down, ocfg.dept_err, ocfg.beam_err)
        tr = jnp.einsum("nii->n", var_b) / 3.0
        g_mid = 0.5 * (gyr[:-1] + gyr[1:])
        a_mid = 0.5 * (acc[:-1] + acc[1:])
        heads = jnp.clip(imu_ts[:-1], scal[2], scal[1])
        tails = jnp.clip(imu_ts[1:], scal[2], scal[1])
        dtp = (tails - heads) * (imask[:-1] * imask[1:])
        p_new = pre.integrate(g_mid, a_mid, dtp, imask[1:], st.bg, st.ba,
                              nm, nw)
        preints2 = jax.tree.map(
            lambda a, b: jnp.concatenate([a[1:], b[None]], axis=0),
            preints, p_new)
        return st, down, dmask, var_b, tr, preints2

    @jax.jit
    def j_iekf(x_prop, levels, down, var_b, dmask):
        return iekf.iekf_update(x_prop, levels, cfg.map, down, var_b, dmask,
                                max_iter=ocfg.max_iter,
                                degrade_eig=ocfg.degrade_eig)

    j_insert = jax.jit(
        lambda levels, st, down, tr, dmask, mp, jour: vm.insert_scan(
            levels, cfg.map, down @ st.R.T + st.p, down, tr, dmask,
            mp[W - 1], jour))

    j_refresh = jax.jit(
        lambda levels, win, mp: vm.refresh_planes(levels, cfg.map, win.R,
                                                  win.p, mp, W))

    j_harvest = jax.jit(lambda levels, mp: vm.harvest(levels, cfg.map, mp,
                                                      cfg.lba.factor_max))

    @jax.jit
    def j_lm(win, st, factors, preints):
        win2 = jax.tree.map(lambda a, b: a.at[W - 1].set(b), win, st)
        new_win, H, r0, r1, conv = opt.lm_li(
            win2, factors, preints, jnp.ones((W,)),
            imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter)
        return new_win, H, r0, r1

    @jax.jit
    def j_post(levels, new_win, mp, H, r0, r1, ok, matches, nnt0):
        levels = vm.refresh_planes(levels, cfg.map, new_win.R, new_win.p,
                                   mp, W)
        levels = vm.marginalize(levels, cfg.map, new_win.R, new_win.p,
                                mp, W, mg)
        mp_new = jnp.concatenate([mp[mg:], mp[:mg]])
        emitted = new_win[slice(0, mg)]
        win_next = jax.tree.map(
            lambda a: jnp.concatenate([a[mg:], a[:mg]], axis=0), new_win)
        x_out = new_win[W - 1]
        d6 = jnp.diag(H)[0:6]
        v6 = 1.0 / jnp.maximum(d6, 1e-6)
        stats = jnp.concatenate([
            jnp.stack([ok.astype(jnp.float32), matches.astype(jnp.float32),
                       nnt0, r0, r1]),
            v6, emitted.t.reshape(-1), emitted.R.reshape(-1),
            emitted.p.reshape(-1), emitted.v.reshape(-1),
            emitted.bg.reshape(-1), emitted.ba.reshape(-1),
            emitted.g.reshape(-1)])
        return levels, win_next, mp_new, x_out, stats

    # --- build synthetic warm state --------------------------------------
    levels = vm.empty_map(cfg.map)
    for s in range(W):
        pts = jnp.array(np.stack([
            rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
            rng.normal(0.5, 0.01, N)], -1), jnp.float32)
        st0 = NavState.identity()
        mp_s = jnp.roll(jnp.arange(W, dtype=jnp.int32), W - 1 - s)
        levels = j_insert(levels, st0, pts, jnp.full((N,), 1e-4),
                          jnp.ones(N), mp_s, 0.0)
    win = stack_states([NavState.identity() for _ in range(W)])
    win = dataclasses.replace(
        win, p=jnp.array(rng.normal(0, 0.1, (W, 3)), jnp.float32))
    mp = jnp.arange(W, dtype=jnp.int32)
    levels = j_refresh(levels, win, mp)
    state = dataclasses.replace(NavState.identity(), cov=jnp.eye(15) * 1e-2)
    g1 = jnp.array(rng.normal(0, 0.01, (M - 1, 3)), jnp.float32)
    a1 = jnp.array(rng.normal(0, 0.01, (M - 1, 3)), jnp.float32) \
        + jnp.array([0, 0, 9.81])
    p_one = pre.integrate(g1, a1, jnp.full((M - 1,), 0.005),
                          jnp.ones((M - 1,)), jnp.zeros(3), jnp.zeros(3),
                          nm, nw)
    preints = jax.tree.map(lambda a: jnp.stack([a] * (W - 1)), p_one)

    imu_np = rng.random((M, 8)).astype(np.float32)
    imu_np[:, 0] = 1.0 + np.arange(M) * 0.005
    imu_np[:, 7] = 1.0
    imu_np[:, 1:4] *= 0.01
    imu_np[:, 4:7] = imu_np[:, 4:7] * 0.01 + np.array([0, 0, 9.81])
    pts_np = np.stack([rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
                       rng.normal(0.5, 0.01, N)], -1).astype(np.float32)
    scan_np = np.concatenate([pts_np, np.zeros((N, 1), np.float32),
                              np.ones((N, 1), np.float32)], 1)
    scal_np = np.array([1.0, 1.1, 1.0, 0.0], np.float32)

    # --- steady loop -------------------------------------------------------
    def one_scan(carry, prev_stats):
        state, levels, win, mp, preints = carry
        imu_blob = jnp.array(imu_np)
        scan_blob = jnp.array(scan_np)
        scal = jnp.array(scal_np)
        st, down, dmask, var_b, tr, preints = j_front(
            state, preints, imu_blob, scan_blob, scal)
        st2, ok, diag = j_iekf(st, levels, down, var_b, dmask)
        levels = j_insert(levels, st2, down, tr, dmask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        levels, win, mp, x_out, stats = j_post(
            levels, new_win, mp, H, r0, r1, ok, diag["matches"],
            diag["nnt_eig"][0])
        if prev_stats is not None:
            np.asarray(prev_stats)  # deferred fetch (previous scan)
        return (x_out, levels, win, mp, preints), stats

    carry = (state, levels, win, mp, preints)
    prev = None
    # warm (compile)
    for _ in range(3):
        carry, prev = one_scan(carry, prev)
    jax.block_until_ready(carry)
    t0 = time.time()
    reps = 20
    for _ in range(reps):
        carry, prev = one_scan(carry, prev)
    np.asarray(prev)
    jax.block_until_ready(carry)
    dt = (time.time() - t0) / reps
    print(f"chained steady scan: {dt*1e3:8.2f} ms/scan = {1/dt:6.1f} fps")

    # --- per-stage wall inside the chain (block after each) ---------------
    state, levels, win, mp, preints = carry
    acc = {}
    for r in range(10):
        tms = {}
        tt = time.time()

        def mark(name):
            nonlocal tt
            jax.block_until_ready(_last[0])
            now = time.time()
            tms[name] = (now - tt) * 1e3
            tt = now

        _last = [None]
        imu_blob = jnp.array(imu_np)
        scan_blob = jnp.array(scan_np)
        scal = jnp.array(scal_np)
        _last[0] = (imu_blob, scan_blob)
        mark("upload")
        out = j_front(state, preints, imu_blob, scan_blob, scal)
        st, down, dmask, var_b, tr, preints = out
        _last[0] = out
        mark("front")
        st2, ok, diag = j_iekf(st, levels, down, var_b, dmask)
        _last[0] = st2
        mark("iekf")
        levels = j_insert(levels, st2, down, tr, dmask, mp, 0.0)
        _last[0] = levels
        mark("insert")
        levels = j_refresh(levels, win, mp)
        _last[0] = levels
        mark("refresh")
        factors = j_harvest(levels, mp)
        _last[0] = factors
        mark("harvest")
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        _last[0] = new_win
        mark("lm")
        levels, win, mp, x_out, stats = j_post(
            levels, new_win, mp, H, r0, r1, ok, diag["matches"],
            diag["nnt_eig"][0])
        state = x_out
        _last[0] = stats
        mark("post")
        np.asarray(stats)
        mark("fetch")
        for k, v in tms.items():
            acc.setdefault(k, []).append(v)
    for k, v in acc.items():
        print(f"  {k:10s} {np.median(v):8.2f} ms")


if __name__ == "__main__":
    main()
