"""Layout experiment: (C,3,3) trailing-minor vs component-major (.., C).

Times the cluster world-transform (the refresh_planes inner op) in both
layouts on the current backend.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    C = 1 << 16
    W = 10
    rng = np.random.default_rng(0)
    R = jnp.array(rng.standard_normal((3, 3)), jnp.float32)
    p = jnp.array(rng.standard_normal(3), jnp.float32)

    # layout A: (C, W, 3, 3) / (C, W, 3) / (C, W)
    S_a = jnp.array(rng.standard_normal((C, W, 3, 3)), jnp.float32)
    mu_a = jnp.array(rng.standard_normal((C, W, 3)), jnp.float32)
    n_a = jnp.array(rng.random((C, W)), jnp.float32)

    def transform_a(S, mu, n, R, p):
        # world S' = R S R^T + n * (Rmu p^T + p Rmu^T + p p^T), mu' = R mu + p
        Rmu = jnp.einsum("ij,cwj->cwi", R, mu)
        mu2 = Rmu + p
        S2 = (jnp.einsum("ij,cwjk,lk->cwil", R, S, R)
              + n[..., None, None] * (mu2[..., :, None] * mu2[..., None, :]))
        return S2.sum(1), mu2.sum(1), n.sum(1)

    # layout B: component-major S (6, W, C), mu (3, W, C), n (W, C)
    S_b = jnp.array(rng.standard_normal((6, W, C)), jnp.float32)
    mu_b = jnp.array(rng.standard_normal((3, W, C)), jnp.float32)
    n_b = jnp.array(rng.random((W, C)), jnp.float32)

    def transform_b(S, mu, n, R, p):
        # unpack packed symmetric [xx,yy,zz,xy,xz,yz]
        xx, yy, zz, xy, xz, yz = S
        # rows of R
        out = []
        Sm = [[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]]
        # RS = R @ S  (3x3 matmul unrolled over component arrays)
        RS = [[sum(R[i, k] * Sm[k][j] for k in range(3)) for j in range(3)]
              for i in range(3)]
        RSRT = [[sum(RS[i][k] * R[j, k] for k in range(3)) for j in range(3)]
                for i in range(3)]
        mu2 = [sum(R[i, k] * mu[k] for k in range(3)) + p[i] for i in range(3)]
        S2 = [RSRT[0][0] + n * mu2[0] * mu2[0],
              RSRT[1][1] + n * mu2[1] * mu2[1],
              RSRT[2][2] + n * mu2[2] * mu2[2],
              RSRT[0][1] + n * mu2[0] * mu2[1],
              RSRT[0][2] + n * mu2[0] * mu2[2],
              RSRT[1][2] + n * mu2[1] * mu2[2]]
        S2 = jnp.stack([s.sum(0) for s in S2])
        mu2 = jnp.stack([m.sum(0) for m in mu2])
        return S2, mu2, n.sum(0)

    ja = jax.jit(transform_a)
    jb = jax.jit(transform_b)

    for name, fn, args in [("A (C,W,3,3)", ja, (S_a, mu_a, n_a, R, p)),
                           ("B (6,W,C)", jb, (S_b, mu_b, n_b, R, p))]:
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(20):
            out = fn(*args)
        jax.block_until_ready(out)
        print(f"{name:16s} {(time.time()-t0)/20*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
