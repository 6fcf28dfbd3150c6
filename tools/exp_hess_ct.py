"""Microbench the three LidarFactor Newton builders at bench shapes."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from trace_megastep import enable_cache
enable_cache()
import jax, jax.numpy as jnp, numpy as np
from voxelslam_tpu.ba import lidar_factor as lf
from voxelslam_tpu.core import cluster as cl

F, W = 3072, 10
rng = np.random.default_rng(0)
win = cl.Cluster(
    n=jnp.array(rng.uniform(0, 30, (F, W)), jnp.float32),
    mu=jnp.array(rng.normal(0, 5, (F, W, 3)), jnp.float32),
    S=jnp.array(np.einsum("fwki,fwkj->fwij",
                          rng.normal(0, 1, (F, W, 5, 3)),
                          rng.normal(0, 1, (F, W, 5, 3))), jnp.float32))
fix = cl.Cluster(
    n=jnp.array(rng.uniform(0, 50, (F,)), jnp.float32),
    mu=jnp.array(rng.normal(0, 5, (F, 3)), jnp.float32),
    S=jnp.array(np.einsum("fki,fkj->fij",
                          rng.normal(0, 1, (F, 8, 3)),
                          rng.normal(0, 1, (F, 8, 3))), jnp.float32))
fb = lf.FactorBatch(win=win, fix=fix,
                    coeff=jnp.ones(F), valid=jnp.ones(F, bool))
Rs = jnp.tile(jnp.eye(3), (W, 1, 1))
ps = jnp.array(rng.normal(0, 1, (W, 3)), jnp.float32)
mask = jnp.ones(W)

for name in ("hess_grad", "hess_grad_analytic", "hess_grad_ct"):
    fn = jax.jit(getattr(lf, name))
    H, g = fn(fb, Rs, ps, mask)
    jax.block_until_ready((H, g))
    t0 = time.time()
    n = 30
    for _ in range(n):
        H, g = fn(fb, Rs, ps, mask)
    jax.block_until_ready((H, g))
    print(f"{name}: {(time.time()-t0)/n*1e3:.3f} ms")
