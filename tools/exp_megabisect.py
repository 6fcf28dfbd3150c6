"""Bisect the megastep composition: time incrementally larger fused
graphs on synthetic state to find which stage composition explodes.

Also prints the device layouts of key arrays (fresh vs jit-produced) to
test the padded-layout hypothesis.
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
    print(f"{name:40s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out


def main():
    enable_cache()
    import dataclasses
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
        LocalBAConfig
    from voxelslam_tpu.core.state import NavState, stack_states
    from voxelslam_tpu.map import voxel_map as vm
    from voxelslam_tpu.imu import preintegration as pre
    from voxelslam_tpu.ba import optimizers as opt
    from voxelslam_tpu.odom import iekf
    from voxelslam_tpu.pipeline.odometry import SlamPipeline

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    W = cfg.lba.win_size
    rng = np.random.default_rng(0)
    N = cfg.odom.point_max
    M = cfg.odom.imu_max

    # synthetic state (same as exp_bisect)
    levels = vm.empty_map(cfg.map)
    j_ins = jax.jit(lambda lv, p, m, t_, s: vm.insert_scan(
        lv, cfg.map, p, p, t_, m, s))
    for s in range(W):
        pts = jnp.array(np.stack([
            rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
            rng.normal(0.5, 0.01, N)], -1), jnp.float32)
        levels = j_ins(levels, pts, jnp.ones(N), jnp.full((N,), 1e-4), s)
    win = stack_states([NavState.identity() for _ in range(W)])
    win = dataclasses.replace(win,
                              p=jnp.array(rng.normal(0, 0.1, (W, 3)),
                                          jnp.float32))
    mp = jnp.arange(W, dtype=jnp.int32)
    levels = jax.jit(lambda lv, w, m: vm.refresh_planes(
        lv, cfg.map, w.R, w.p, m, W))(levels, win, mp)
    state = dataclasses.replace(NavState.identity(), cov=jnp.eye(15) * 1e-2)

    nm = jnp.diag(jnp.array([cfg.lba.noise_gyr] * 3
                            + [cfg.lba.noise_acc] * 3, jnp.float32))
    nw = jnp.diag(jnp.array([cfg.lba.walk_gyr] * 3
                            + [cfg.lba.walk_acc] * 3, jnp.float32))
    g1 = jnp.array(rng.normal(0, 0.01, (M - 1, 3)), jnp.float32)
    a1 = jnp.array(rng.normal(0, 0.01, (M - 1, 3)), jnp.float32) \
        + jnp.array([0, 0, 9.81])
    dt1 = jnp.full((M - 1,), 0.005)
    m1 = jnp.ones((M - 1,))
    j_int = jax.jit(lambda g, a, dt, m, bg, ba: pre.integrate(
        g, a, dt, m, bg, ba, nm, nw))
    p_one = j_int(g1, a1, dt1, m1, jnp.zeros(3), jnp.zeros(3))
    preints = jax.tree.map(lambda a: jnp.stack([a] * (W - 1)), p_one)

    pipe = SlamPipeline.__new__(SlamPipeline)  # skip __init__ compiles
    pipe.cfg = cfg
    pipe.collect_clouds = False
    pipe.noise_meas = nm
    pipe.noise_walk = nw
    pipe.R_ext = jnp.eye(3)
    pipe.t_ext = jnp.zeros(3)

    imu_blob = jnp.array(rng.random((M, 8)), jnp.float32)
    imu_blob = imu_blob.at[:, 0].set(1.0 + jnp.arange(M) * 0.005)
    imu_blob = imu_blob.at[:, 7].set(1.0)
    pts = np.stack([rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
                    rng.normal(0.5, 0.01, N)], -1).astype(np.float32)
    scan_blob = jnp.array(np.concatenate(
        [pts, np.zeros((N, 1), np.float32), np.ones((N, 1), np.float32)], 1))
    scal = jnp.array([1.0, 1.1, 1.0, 0.0], jnp.float32)

    # ---- lm_li alone -------------------------------------------------------
    factors = jax.jit(lambda lv, m: vm.harvest(lv, cfg.map, m,
                                               cfg.lba.factor_max))(levels, mp)
    timeit("lm_li alone", jax.jit(lambda w, f, p: opt.lm_li(
        w, f, p, jnp.ones((W,)), imu_coef=cfg.lba.imu_coef,
        max_iter=cfg.lba.max_iter)), win, factors, preints)

    # ---- incremental megastep fragments -----------------------------------
    def frag_a(state, levels, win, mp, preints, imu_blob, scan_blob, scal):
        imu_ts, gyr, acc, imask = (imu_blob[:, 0], imu_blob[:, 1:4],
                                   imu_blob[:, 4:7], imu_blob[:, 7])
        p_, off, pm = scan_blob[:, 0:3], scan_blob[:, 3], scan_blob[:, 4]
        x_prop, body = pipe._prop_deskew(state, imu_ts, gyr, acc, imask,
                                         scal[0], scal[1], scal[2], p_, off,
                                         pm)
        down, dmask, var_b, tr = pipe._downsample_var(body, pm)
        g_mid = 0.5 * (gyr[:-1] + gyr[1:])
        a_mid = 0.5 * (acc[:-1] + acc[1:])
        heads = jnp.clip(imu_ts[:-1], scal[2], scal[1])
        tails = jnp.clip(imu_ts[1:], scal[2], scal[1])
        dtp = (tails - heads) * (imask[:-1] * imask[1:])
        p_new = pre.integrate(g_mid, a_mid, dtp, imask[1:], x_prop.bg,
                              x_prop.ba, nm, nw)
        preints2 = jax.tree.map(
            lambda a, b: jnp.concatenate([a[1:], b[None]], axis=0),
            preints, p_new)
        return x_prop, down, dmask, var_b, tr, preints2

    def frag_b(*args):
        x_prop, down, dmask, var_b, tr, preints2 = frag_a(*args)
        st, ok, diag = iekf.iekf_update(
            x_prop, args[1], cfg.map, down, var_b, dmask,
            max_iter=cfg.odom.max_iter, degrade_eig=cfg.odom.degrade_eig)
        return st, ok, down, dmask, tr, preints2

    def frag_c(*args):
        st, ok, down, dmask, tr, preints2 = frag_b(*args)
        levels, win, mp = args[1], args[2], args[3]
        win2 = jax.tree.map(lambda a, b: a.at[W - 1].set(b), win, st)
        wld = down @ st.R.T + st.p
        lv2 = vm.insert_scan(levels, cfg.map, wld, down, tr, dmask,
                             mp[W - 1], scal[3])
        lv2 = vm.refresh_planes(lv2, cfg.map, win2.R, win2.p, mp, W)
        return lv2, win2, st, preints2

    def frag_d(*args):
        lv2, win2, st, preints2 = frag_c(*args)
        mp = args[3]
        factors = vm.harvest(lv2, cfg.map, mp, cfg.lba.factor_max)
        new_win, H, r0, r1, conv = opt.lm_li(
            win2, factors, preints2, jnp.ones((W,)),
            imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter)
        return lv2, new_win, H, r0, r1, preints2

    def frag_e(*args):
        lv2, new_win, H, r0, r1, preints2 = frag_d(*args)
        mp, mg = args[3], cfg.lba.mgsize
        lv2 = vm.refresh_planes(lv2, cfg.map, new_win.R, new_win.p, mp, W)
        lv2 = vm.marginalize(lv2, cfg.map, new_win.R, new_win.p, mp, W, mg)
        mp_new = jnp.concatenate([mp[mg:], mp[:mg]])
        win_next = jax.tree.map(
            lambda a: jnp.concatenate([a[mg:], a[:mg]], axis=0), new_win)
        return lv2, win_next, mp_new, preints2, r0, r1

    args = (state, levels, win, mp, preints, imu_blob, scan_blob, scal)
    timeit("frag A: prop+deskew+down+preint", jax.jit(frag_a), *args)
    timeit("frag B: A + iekf", jax.jit(frag_b), *args)
    timeit("frag C: B + insert + refresh", jax.jit(frag_c), *args)
    timeit("frag D: C + harvest + lm_li", jax.jit(frag_d), *args)
    timeit("frag E: D + refresh+margi+slide", jax.jit(frag_e), *args)


if __name__ == "__main__":
    main()
