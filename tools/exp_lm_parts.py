"""Decompose lm_li runtime: solve, imu terms, residual, full iteration."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trace_megastep import enable_cache
enable_cache()
import jax, jax.numpy as jnp, numpy as np
from voxelslam_tpu.ba import lidar_factor as lf, optimizers as opt
from voxelslam_tpu.core import cluster as cl
from voxelslam_tpu.core.state import NavState
from voxelslam_tpu.imu import preintegration as pre

F, W, DIM = 3072, 10, 15
rng = np.random.default_rng(0)
win = cl.Cluster(
    n=jnp.array(rng.uniform(0, 30, (F, W)), jnp.float32),
    mu=jnp.array(rng.normal(0, 5, (F, W, 3)), jnp.float32),
    S=jnp.array(np.einsum("fwki,fwkj->fwij",
                          rng.normal(0, 1, (F, W, 5, 3)),
                          rng.normal(0, 1, (F, W, 5, 3))), jnp.float32))
fix = cl.Cluster.empty((F,))
fb = lf.FactorBatch(win=win, fix=fix, coeff=jnp.ones(F),
                    valid=jnp.ones(F, bool))
states = jax.tree.map(lambda *x: jnp.stack(x),
                      *[NavState.identity() for _ in range(W)])
g_m = jnp.array(rng.normal(0, 0.1, (W - 1, 63, 3)), jnp.float32)
a_m = jnp.array(rng.normal(0, 1, (W - 1, 63, 3)) + [0, 0, 9.81], jnp.float32)
dt = jnp.full((W - 1, 63), 0.005)
mmask = jnp.ones((W - 1, 63))
nm = jnp.eye(6) * 1e-4
preints = jax.vmap(lambda g, a, d, m: pre.integrate(
    g, a, d, m, jnp.zeros(3), jnp.zeros(3), nm, nm))(g_m, a_m, dt, mmask)

def bench(name, fn, *args):
    out = fn(*args); jax.block_until_ready(out)
    t0 = time.time(); n = 30
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name}: {(time.time()-t0)/n*1e3:.3f} ms")

H = jnp.array(rng.normal(0, 1, (153, 153)), jnp.float32)
H = H @ H.T + 153 * jnp.eye(153)
g = jnp.array(rng.normal(0, 1, (153,)), jnp.float32)
bench("solve153", jax.jit(opt._solve_scaled), H, g)
Winv = jax.vmap(pre.cov_inv)(preints)
bench("cov_inv(9x15x15)", jax.jit(jax.vmap(pre.cov_inv)), preints)
bench("imu_terms", jax.jit(lambda s, p, wi: opt._imu_terms(s, p, 1e-4, False, wi)),
      states, preints, Winv)
bench("li_eval", jax.jit(lambda s, f, p, wi: opt._li_eval(
    s, f, p, jnp.ones(W), 1e-4, False, 0.0, wi)), states, fb, preints, Winv)
bench("li_residual", jax.jit(lambda s, f, p, wi: opt._li_residual(
    s, f, p, jnp.ones(W), 1e-4, 0.0, wi)), states, fb, preints, Winv)
bench("lm_li(3 iters)", jax.jit(lambda s, f, p: opt.lm_li(
    s, f, p, jnp.ones(W), 1e-4, 3)), states, fb, preints)
