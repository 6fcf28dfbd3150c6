"""Grow the stage chain incrementally to find which boundary serializes
the pipeline on the tunneled backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def enable_cache():
    import jax
    jax.config.update("jax_compilation_cache_dir", os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def main():
    enable_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
        LocalBAConfig
    from voxelslam_tpu.core.state import NavState, stack_states
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
    ocfg = cfg.odom
    rng = np.random.default_rng(0)
    N = cfg.odom.point_max
    M = cfg.odom.imu_max

    nm = jnp.diag(jnp.array([cfg.lba.noise_gyr] * 3
                            + [cfg.lba.noise_acc] * 3, jnp.float32))
    nw = jnp.diag(jnp.array([cfg.lba.walk_gyr] * 3
                            + [cfg.lba.walk_acc] * 3, jnp.float32))

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
    def j_iekf(x_prop, levels, down, var_b, dmask):
        return iekf.iekf_update(x_prop, levels, cfg.map, down, var_b, dmask,
                                max_iter=ocfg.max_iter,
                                degrade_eig=ocfg.degrade_eig)

    @jax.jit
    def j_lm(win, st, factors, preints):
        win2 = jax.tree.map(lambda a, b: a.at[W - 1].set(b), win, st)
        new_win, H, r0, r1, conv = opt.lm_li(
            win2, factors, preints, jnp.ones((W,)),
            imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter)
        return new_win, H, r0, r1

    @jax.jit
    def j_post(levels, new_win, mp):
        levels = vm.refresh_planes(levels, cfg.map, new_win.R, new_win.p,
                                   mp, W)
        levels = vm.marginalize(levels, cfg.map, new_win.R, new_win.p,
                                mp, W, mg)
        mp_new = jnp.concatenate([mp[mg:], mp[:mg]])
        win_next = jax.tree.map(
            lambda a: jnp.concatenate([a[mg:], a[:mg]], axis=0), new_win)
        return levels, win_next, mp_new

    # state
    levels = vm.empty_map(cfg.map)
    pts = jnp.array(np.stack([
        rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
        rng.normal(0.5, 0.01, N)], -1), jnp.float32)
    tr = jnp.full((N,), 1e-4)
    mask = jnp.ones(N)
    st0 = NavState.identity()
    mp = jnp.arange(W, dtype=jnp.int32)
    for s in range(W):
        levels = j_insert(levels, st0, pts, tr, mask,
                          jnp.roll(mp, W - 1 - s), 0.0)
    win = stack_states([NavState.identity() for _ in range(W)])
    levels = j_refresh(levels, win, mp)
    state = dataclasses.replace(NavState.identity(), cov=jnp.eye(15) * 1e-2)
    var_b = iekf.point_var_body(pts, ocfg.dept_err, ocfg.beam_err)
    g1 = jnp.array(rng.normal(0, 0.01, (M - 1, 3)), jnp.float32)
    a1 = jnp.zeros((M - 1, 3)) + jnp.array([0, 0, 9.81])
    p_one = pre.integrate(g1, a1, jnp.full((M - 1,), 0.005),
                          jnp.ones((M - 1,)), jnp.zeros(3), jnp.zeros(3),
                          nm, nw)
    preints = jax.tree.map(lambda a: jnp.stack([a] * (W - 1)), p_one)
    jax.block_until_ready((levels, preints))

    def bench(name, step, carry, reps=15):
        carry = step(carry)
        jax.block_until_ready(carry)
        t0 = time.time()
        for _ in range(reps):
            carry = step(carry)
        jax.block_until_ready(carry)
        print(f"{name:44s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
        return carry

    # chain 1: ins -> ref
    def c1(c):
        levels, win, mp = c
        levels = j_insert(levels, st0, pts, tr, mask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        return levels, win, mp
    (levels, win, mp) = bench("ins->ref", c1, (levels, win, mp))

    # chain 2: + harvest (+consume factors trivially? keep alive)
    def c2(c):
        levels, win, mp = c
        levels = j_insert(levels, st0, pts, tr, mask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        return levels, win, mp
    (levels, win, mp) = bench("ins->ref->harvest", c2, (levels, win, mp))

    # chain 3: + iekf before insert
    def c3(c):
        levels, win, mp = c
        st2, ok, diag = j_iekf(state, levels, pts, var_b, mask)
        levels = j_insert(levels, st2, pts, tr, mask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        return levels, win, mp
    (levels, win, mp) = bench("iekf->ins->ref", c3, (levels, win, mp))

    # chain 4: ins->ref->harvest->lm
    def c4(c):
        levels, win, mp = c
        levels = j_insert(levels, st0, pts, tr, mask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st0, factors, preints)
        return levels, new_win, mp
    (levels, win, mp) = bench("ins->ref->harvest->lm", c4, (levels, win, mp))

    # chain 5: + post
    def c5(c):
        levels, win, mp = c
        levels = j_insert(levels, st0, pts, tr, mask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st0, factors, preints)
        levels, win_next, mp_new = j_post(levels, new_win, mp)
        return levels, win_next, mp_new
    (levels, win, mp) = bench("ins->ref->harvest->lm->post", c5,
                              (levels, win, mp))

    # chain 6: full incl iekf
    def c6(c):
        levels, win, mp = c
        st2, ok, diag = j_iekf(state, levels, pts, var_b, mask)
        levels = j_insert(levels, st2, pts, tr, mask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        levels, win_next, mp_new = j_post(levels, new_win, mp)
        return levels, win_next, mp_new
    (levels, win, mp) = bench("full w/o front", c6, (levels, win, mp))

    # front pieces
    imu_np = rng.random((M, 8)).astype(np.float32)
    imu_np[:, 0] = 1.0 + np.arange(M) * 0.005
    imu_np[:, 7] = 1.0
    imu_np[:, 1:4] *= 0.01
    imu_np[:, 4:7] = imu_np[:, 4:7] * 0.01 + np.array([0, 0, 9.81])
    scan_np = np.concatenate([np.asarray(pts),
                              np.zeros((N, 1), np.float32),
                              np.ones((N, 1), np.float32)], 1)
    scal_np = np.array([1.0, 1.1, 1.0, 0.0], np.float32)
    imu_blob0 = jnp.array(imu_np)
    scan_blob0 = jnp.array(scan_np)
    scal0 = jnp.array(scal_np)

    @jax.jit
    def j_front(state, preints, imu_blob, scan_blob, scal):
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
        heads = jnp.clip(imu_ts[:-1], scal[2], scal[1])
        tails = jnp.clip(imu_ts[1:], scal[2], scal[1])
        dtp = (tails - heads) * (imask[:-1] * imask[1:])
        p_new = pre.integrate(g_mid, a_mid, dtp, imask[1:], stp.bg, stp.ba,
                              nm, nw)
        preints2 = jax.tree.map(
            lambda a, b: jnp.concatenate([a[1:], b[None]], axis=0),
            preints, p_new)
        return stp, down, dmask, var_b, trd, preints2

    # chain 7: + front, fixed device blobs
    def c7(c):
        levels, win, mp, state, preints = c
        stp, down, dmask, var_b2, trd, preints = j_front(
            state, preints, imu_blob0, scan_blob0, scal0)
        st2, ok, diag = j_iekf(stp, levels, down, var_b2, dmask)
        levels = j_insert(levels, st2, down, trd, dmask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        levels, win_next, mp_new = j_post(levels, new_win, mp)
        return levels, win_next, mp_new, state, preints
    carry = (levels, win, mp, state, preints)
    carry = bench("full + front (fixed blobs)", c7, carry)

    # chain 8: + fresh uploads each scan
    def c8(c):
        levels, win, mp, state, preints = c
        ib = jnp.array(imu_np)
        sb = jnp.array(scan_np)
        sc = jnp.array(scal_np)
        stp, down, dmask, var_b2, trd, preints = j_front(
            state, preints, ib, sb, sc)
        st2, ok, diag = j_iekf(stp, levels, down, var_b2, dmask)
        levels = j_insert(levels, st2, down, trd, dmask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        levels, win_next, mp_new = j_post(levels, new_win, mp)
        return levels, win_next, mp_new, state, preints
    carry = bench("full + fresh uploads", c8, carry)

    # chain 9: + blocking tiny fetch of previous scan's stats
    prev = [None]

    def c9(c):
        levels, win, mp, state, preints = c
        stp, down, dmask, var_b2, trd, preints = j_front(
            state, preints, imu_blob0, scan_blob0, scal0)
        st2, ok, diag = j_iekf(stp, levels, down, var_b2, dmask)
        levels = j_insert(levels, st2, down, trd, dmask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        levels, win_next, mp_new = j_post(levels, new_win, mp)
        if prev[0] is not None:
            np.asarray(prev[0])
        prev[0] = r1
        return levels, win_next, mp_new, state, preints
    carry = bench("full + deferred stats fetch", c9, carry)

    # chain 10: + async host copy instead
    def c10(c):
        levels, win, mp, state, preints = c
        stp, down, dmask, var_b2, trd, preints = j_front(
            state, preints, imu_blob0, scan_blob0, scal0)
        st2, ok, diag = j_iekf(stp, levels, down, var_b2, dmask)
        levels = j_insert(levels, st2, down, trd, dmask, mp, 0.0)
        levels = j_refresh(levels, win, mp)
        factors = j_harvest(levels, mp)
        new_win, H, r0, r1 = j_lm(win, st2, factors, preints)
        levels, win_next, mp_new = j_post(levels, new_win, mp)
        r1.copy_to_host_async()
        if prev[0] is not None:
            np.asarray(prev[0])
        prev[0] = r1
        return levels, win_next, mp_new, state, preints
    carry = bench("full + async-copy stats fetch", c10, carry)


if __name__ == "__main__":
    main()
