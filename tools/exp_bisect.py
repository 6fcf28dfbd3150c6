"""Bisect: same jitted stage fns as profile_stages, but on synthetic map
state of identical shapes. Distinguishes 'vm functions are slow at this
config' from 'the pipeline-produced state is slow (layouts)'."""
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
    from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, \
        LocalBAConfig
    from voxelslam_tpu.map import voxel_map as vm
    import dataclasses
    from voxelslam_tpu.core.state import NavState, stack_states
    from voxelslam_tpu.odom import iekf

    cfg = SlamConfig(
        map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                      unique_max=(4096, 4096, 8192)),
        odom=OdometryConfig(point_max=4096, imu_max=64),
        lba=LocalBAConfig(factor_max=1024),
    )
    W = cfg.lba.win_size
    rng = np.random.default_rng(0)
    N = 4096

    levels = vm.empty_map(cfg.map)
    j_ins = jax.jit(lambda lv, p, m, t_, s: vm.insert_scan(
        lv, cfg.map, p, p, t_, m, s))
    for s in range(W):
        pts = jnp.array(np.stack([
            rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
            rng.normal(0.5, 0.01, N)], -1), jnp.float32)
        levels = j_ins(levels, pts, jnp.ones(N), jnp.full((N,), 1e-4), s)
    jax.block_until_ready(levels)

    Rs = jnp.tile(jnp.eye(3)[None], (W, 1, 1))
    ps = jnp.array(rng.normal(0, 0.1, (W, 3)), jnp.float32)
    mp = jnp.arange(W, dtype=jnp.int32)
    win = stack_states([NavState.identity() for _ in range(W)])
    win = dataclasses.replace(win, p=ps)

    j_refresh = jax.jit(lambda lv, w, m: vm.refresh_planes(
        lv, cfg.map, w.R, w.p, m, W))
    j_iekf = jax.jit(lambda s, lv, p, vb, m: iekf.iekf_update(
        s, lv, cfg.map, p, vb, m, max_iter=cfg.odom.max_iter))
    j_harvest = jax.jit(lambda lv, m: vm.harvest(lv, cfg.map, m,
                                                 cfg.lba.factor_max))
    j_marg = jax.jit(lambda lv, w, m: vm.marginalize(
        lv, cfg.map, w.R, w.p, m, W, 1))

    pts = jnp.array(np.stack([
        rng.uniform(-14, 14, N), rng.uniform(-12, 12, N),
        rng.normal(0.5, 0.01, N)], -1), jnp.float32)
    mask = jnp.ones(N)
    trv = jnp.full((N,), 1e-4)
    state = dataclasses.replace(NavState.identity(), cov=jnp.eye(15) * 1e-2)
    var_b = iekf.point_var_body(pts, cfg.odom.dept_err, cfg.odom.beam_err)

    timeit("insert_scan", lambda lv: j_ins(lv, pts, mask, trv, 3), levels)
    lv2 = timeit("refresh_planes", j_refresh, levels, win, mp)
    timeit("iekf_update(4 iters)", j_iekf, state, lv2, pts, var_b, mask)
    timeit("harvest", j_harvest, lv2, mp)
    timeit("marginalize", j_marg, lv2, win, mp)

    # now sub-time insert internals at level 2 (the big one)
    from voxelslam_tpu.ops import voxel_hash as vh
    lv = levels[2]
    ls = cfg.map.level_size(2)
    um = cfg.map.unique_max[2]
    keys = vh.voxel_key(pts, ls)
    timeit("  dedup_keys L2", jax.jit(lambda k, m: vh.dedup_keys(k, m, um)),
           keys, mask > 0)
    uniq, uvalid, inv = jax.jit(lambda k, m: vh.dedup_keys(k, m, um))(
        keys, mask > 0)
    timeit("  hash insert L2", jax.jit(vh.insert), lv.keys, lv.occ,
           uniq, uvalid)
    timeit("  insert_scan_level L2", jax.jit(
        lambda l_, p, m, t_: vm.insert_scan_level(l_, ls, um, p, p, t_, m,
                                                  3, 0.0)), lv, pts, mask, trv)


if __name__ == "__main__":
    main()
