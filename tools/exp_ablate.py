"""Ablation timing of the fused megastep: re-jit the step with
individual stages no-op'd to attribute device time inside the REAL
fused graph (isolated stage timings pay dispatch overhead and miss
XLA overlap).

Usage: python tools/exp_ablate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trace_megastep import enable_cache, build_warm_pipeline  # noqa: E402


def time_step(pipe, fn, blobs, n=30):
    import jax
    imu_blob, scan_blob, scal = blobs
    outs = fn(pipe.x, pipe.levels, pipe.win, pipe.mp, pipe.preints_dev,
              pipe._stats_ring, imu_blob, scan_blob, scal)
    jax.block_until_ready(outs)
    x, levels, win, mp, preints, ring = outs[:6]
    t0 = time.time()
    for _ in range(n):
        outs = fn(x, levels, win, mp, preints, ring,
                  imu_blob, scan_blob, scal)
        x, levels, win, mp, preints, ring = outs[:6]
    jax.block_until_ready(outs)
    return (time.time() - t0) / n * 1e3


def main():
    enable_cache()
    import jax
    from unittest import mock
    from voxelslam_tpu.map import voxel_map as vm
    from voxelslam_tpu.ba import optimizers as opt
    from voxelslam_tpu.odom import iekf
    import jax.numpy as jnp

    pipe, blobs = build_warm_pipeline()

    # fresh jit WITHOUT donation (the pipeline's _jit_megastep donates
    # levels/win/preints, which would delete pipe state between runs)
    base = time_step(pipe, jax.jit(pipe._steady_megastep), blobs)
    print(f"{'full megastep':28s} {base:8.2f} ms", flush=True)

    real_refresh = vm.refresh_planes
    real_marg = vm.marginalize
    real_lm = opt.lm_li
    real_iekf = iekf.iekf_update
    real_insert = vm.insert_scan_fused
    real_harvest = vm.harvest_t

    def no_refresh(levels, cfg, Rs, ps, mp, wc, **kw):
        return levels

    def no_marg(levels, cfg, Rs, ps, mp, wc, mg):
        return levels

    def no_lm(win, factors, preints, wmask, **kw):
        W = win.R.shape[0]
        H = jnp.eye(W * 15)
        return win, H, jnp.float32(1.0), jnp.float32(1.0), jnp.int32(1)

    def no_iekf(x, levels, cfg, pts, var_b, mask, **kw):
        return x, jnp.bool_(True), dict(
            matches=jnp.int32(0), nnt_eig=jnp.zeros(3))

    def no_insert(levels, cfg, pw, pl, tr, mask, fs, jour, R, p, **kw):
        t = [(jnp.zeros((cfg.unique_max[l],), jnp.int32),
              jnp.zeros((cfg.unique_max[l],), bool), jnp.int32(0))
             for l in range(len(levels))]
        return levels, t

    def no_harvest(levels, cfg, mp, fmax):
        import numpy as np
        W = mp.shape[0]
        F = fmax * len(levels)
        return (jnp.zeros((W, F)), jnp.zeros((W, 3, F)),
                jnp.zeros((W, 3, 3, F)), jnp.zeros((F,)),
                jnp.zeros((3, F)), jnp.zeros((3, 3, F)), jnp.zeros((F,)))

    for name, patches in [
        ("no refresh", [(vm, "refresh_planes", no_refresh)]),
        ("no marginalize", [(vm, "marginalize", no_marg)]),
        ("no lm_li", [(opt, "lm_li", no_lm)]),
        ("no iekf", [(iekf, "iekf_update", no_iekf)]),
        ("no insert", [(vm, "insert_scan_fused", no_insert),
                       (vm, "refresh_planes", no_refresh)]),
        ("no harvest+lm", [(vm, "harvest_t", no_harvest),
                           (opt, "lm_li", no_lm)]),
    ]:
        ctxs = [mock.patch.object(m, a, f) for m, a, f in patches]
        for c in ctxs:
            c.start()
        try:
            fn = jax.jit(pipe._steady_megastep)
            t = time_step(pipe, fn, blobs)
            print(f"{name:28s} {t:8.2f} ms  (delta {base - t:+.2f})",
                  flush=True)
        finally:
            for c in ctxs:
                c.stop()


if __name__ == "__main__":
    main()
