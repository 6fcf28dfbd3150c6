"""lm_li in megastep-like context: harvest from full-size levels + LM,
with and without the layout pinning, for each hessian builder."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trace_megastep import enable_cache
enable_cache()
import jax, jax.numpy as jnp, numpy as np
import dataclasses
from voxelslam_tpu.config import SlamConfig, MapConfig, OdometryConfig, LocalBAConfig
from voxelslam_tpu.map import voxel_map as vm
from voxelslam_tpu.ba import optimizers as opt, lidar_factor as lf
from voxelslam_tpu.core.state import NavState
from voxelslam_tpu.imu import preintegration as pre
from voxelslam_tpu.pipeline.odometry import _pin_window_layouts

cfg = SlamConfig(
    map=MapConfig(capacities=(1 << 14, 1 << 15, 1 << 16),
                  unique_max=(4096, 4096, 8192)),
    odom=OdometryConfig(point_max=4096, imu_max=64),
    lba=LocalBAConfig(factor_max=1024),
)
W = cfg.lba.win_size
rng = np.random.default_rng(0)
levels = vm.empty_map(cfg.map)

# populate levels with synthetic occupied voxels + window clusters
def fill(lv, frac):
    C = lv.keys.shape[0]
    occ = jnp.array(rng.random(C) < frac)
    n = jnp.array(rng.uniform(1, 20, (W, C)), jnp.float32) * occ[None]
    mu = jnp.array(rng.normal(0, 2, (W, C, 3)), jnp.float32)
    S = jnp.array(np.einsum("wcki,wckj->wcij",
                            rng.normal(0, 1, (W, C, 4, 3)),
                            rng.normal(0, 1, (W, C, 4, 3))), jnp.float32)
    lam = jnp.array(np.sort(rng.uniform(0, 0.1, (C, 3)), -1), jnp.float32)
    state = jnp.where(occ, vm.STATE_PLANE, 0)
    win = dataclasses.replace(lv.win, n=n, mu=mu, S=S)
    return dataclasses.replace(lv, occ=occ, win=win, state=state, lam=lam)

levels = tuple(fill(lv, 0.15) for lv in levels)
mp = jnp.arange(W, dtype=jnp.int32)
states = jax.tree.map(lambda *x: jnp.stack(x),
                      *[NavState.identity() for _ in range(W)])
g_m = jnp.array(rng.normal(0, 0.1, (W - 1, 63, 3)), jnp.float32)
a_m = jnp.array(rng.normal(0, 1, (W - 1, 63, 3)) + [0, 0, 9.81], jnp.float32)
dt = jnp.full((W - 1, 63), 0.005)
mmask = jnp.ones((W - 1, 63))
nmz = jnp.eye(6) * 1e-4
preints = jax.vmap(lambda g, a, d, m: pre.integrate(
    g, a, d, m, jnp.zeros(3), jnp.zeros(3), nmz, nmz))(g_m, a_m, dt, mmask)

def run(tag, hess_fn, pin):
    old = lf_hess[0]
    lf_hess[0] = hess_fn
    def f(levels, states, preints):
        if pin:
            levels = _pin_window_layouts(list(levels))
        factors = vm.harvest(levels, cfg.map, mp, cfg.lba.factor_max)
        return opt.lm_li(states, factors, preints, jnp.ones(W),
                         imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter)
    jf = jax.jit(f)
    out = jf(levels, states, preints); jax.block_until_ready(out)
    t0 = time.time(); n = 20
    for _ in range(n):
        out = jf(levels, states, preints)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n*1e3:.3f} ms")
    lf_hess[0] = old

# patch point: opt._li_eval calls lf.hess_grad directly; monkeypatch
lf_hess = [lf.hess_grad]
orig = lf.hess_grad
for name in ():
    fn = getattr(lf, name)
    lf.hess_grad = fn
    run(f"harvest+lm_li [{name}] pinned", fn, True)
    run(f"harvest+lm_li [{name}] unpinned", fn, False)
lf.hess_grad = orig

def run_b(tag, hess_fn, barrier):
    lf.hess_grad = hess_fn
    def f(levels, states, preints):
        factors = vm.harvest(levels, cfg.map, mp, cfg.lba.factor_max)
        if barrier:
            factors = jax.lax.optimization_barrier(factors)
        return opt.lm_li(states, factors, preints, jnp.ones(W),
                         imu_coef=cfg.lba.imu_coef, max_iter=cfg.lba.max_iter)
    jf = jax.jit(f)
    out = jf(levels, states, preints); jax.block_until_ready(out)
    t0 = time.time(); n = 20
    for _ in range(n):
        out = jf(levels, states, preints)
    jax.block_until_ready(out)
    print(f"{tag}: {(time.time()-t0)/n*1e3:.3f} ms")

run_b("harvest+lm_li [hess_grad] barrier", orig, True)
run_b("harvest+lm_li [hess_grad_ct] barrier", lf.hess_grad_ct, True)
# harvest alone
jh = jax.jit(lambda levels: vm.harvest(levels, cfg.map, mp, cfg.lba.factor_max))
out = jh(levels); jax.block_until_ready(out)
t0 = time.time()
for _ in range(20): out = jh(levels)
jax.block_until_ready(out)
print(f"harvest alone: {(time.time()-t0)/20*1e3:.3f} ms")
lf.hess_grad = orig
