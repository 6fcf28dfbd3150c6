"""Time hess_grad (jacfwd-of-grad) vs hess_grad_analytic on realistic
factor batches (F=1024, W=10), standalone on the current backend.

Usage: python tools/exp_hess.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.ba import lidar_factor as lf
    from voxelslam_tpu.core.cluster import Cluster
    from voxelslam_tpu.core import so3

    rng = np.random.default_rng(0)
    F, W = 1024, 10

    def rand_cluster(shape):
        n = rng.integers(0, 30, shape).astype(np.float32)
        mu = rng.standard_normal(shape + (3,)).astype(np.float32)
        X = rng.standard_normal(shape + (3, 8)).astype(np.float32)
        S = np.einsum('...ik,...jk->...ij', X, X)
        return Cluster(n=jnp.array(n), mu=jnp.array(mu), S=jnp.array(S))

    fb = lf.FactorBatch(win=rand_cluster((F, W)), fix=rand_cluster((F,)),
                        coeff=jnp.array(rng.random(F), jnp.float32),
                        valid=jnp.array(rng.random(F) > 0.2))
    Rs = so3.exp(jnp.array(rng.standard_normal((W, 3)) * 0.1, jnp.float32))
    ps = jnp.array(rng.standard_normal((W, 3)), jnp.float32)
    mask = jnp.ones(W)

    fns = {
        "jacfwd(grad)": jax.jit(lf.hess_grad),
        "analytic": jax.jit(lf.hess_grad_analytic),
    }
    for name, fn in fns.items():
        H, g = fn(fb, Rs, ps, mask)
        jax.block_until_ready((H, g))
        t0 = time.time()
        it = 30
        for _ in range(it):
            H, g = fn(fb, Rs, ps, mask)
        jax.block_until_ready((H, g))
        print(f"{name:14s} {(time.time()-t0)/it*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
