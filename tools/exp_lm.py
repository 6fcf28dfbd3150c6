"""Decompose the lm_li cost: full LM call, single _li_eval, residual,
and 153x153 solve variants (LU vs Cholesky vs explicit inverse),
standalone on the current backend.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, it=30):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(it):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:22s} {(time.time()-t0)/it*1e3:8.3f} ms", flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.ba import lidar_factor as lf
    from voxelslam_tpu.ba import optimizers as opt
    from voxelslam_tpu.core.cluster import Cluster
    from voxelslam_tpu.core.state import NavState
    from voxelslam_tpu.core import so3
    from voxelslam_tpu.imu import preintegration as pre

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
    states = jax.tree.map(lambda *x: jnp.stack(x),
                          *[NavState.identity() for _ in range(W)])
    import dataclasses
    states = dataclasses.replace(
        states,
        R=so3.exp(jnp.array(rng.standard_normal((W, 3)) * 0.05, jnp.float32)),
        p=jnp.array(rng.standard_normal((W, 3)), jnp.float32))
    # simple preints
    M = 16
    g_ = jnp.zeros((W - 1, M, 3))
    a_ = jnp.tile(jnp.array([0, 0, 9.81], jnp.float32), (W - 1, M, 1))
    dt = jnp.full((W - 1, M), 0.01)
    msk = jnp.ones((W - 1, M))
    nm = jnp.eye(6) * 0.01
    nw = jnp.eye(6) * 1e-4
    preints = jax.vmap(lambda g, a, d, m: pre.integrate(
        g, a, d, m, jnp.zeros(3), jnp.zeros(3), nm, nw))(g_, a_, dt, msk)
    mask = jnp.ones(W)

    timeit("lm_li (3 iters)", jax.jit(
        lambda s, f, p: opt.lm_li(s, f, p, mask, max_iter=3)),
        states, fb, preints)
    timeit("_li_eval", jax.jit(
        lambda s, f, p: opt._li_eval(s, f, p, mask, 1e-4, False)),
        states, fb, preints)
    timeit("_li_residual", jax.jit(
        lambda s, f, p: opt._li_residual(s, f, p, mask, 1e-4)),
        states, fb, preints)

    n = 153
    A = jnp.array(rng.standard_normal((n, n)), jnp.float32)
    A = A @ A.T + n * jnp.eye(n)
    b = jnp.array(rng.standard_normal(n), jnp.float32)
    timeit("solve LU 153", jax.jit(jnp.linalg.solve), A, b)
    timeit("cho_solve 153", jax.jit(
        lambda A, b: jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(A), b)), A, b)
    timeit("inv@b 153", jax.jit(lambda A, b: jnp.linalg.inv(A) @ b), A, b)


if __name__ == "__main__":
    main()
