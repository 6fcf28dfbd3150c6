"""Micro-timing of map primitive ops on the current backend."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def t(name, fn, *args, reps=20):
    import jax
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    print(f"{name:32s} {(time.time()-t0)/reps*1e3:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    from voxelslam_tpu.core.eig3 import eigh3, eigvalsh3
    from voxelslam_tpu.ops import voxel_hash as vh
    from voxelslam_tpu.core import cluster as cl

    rng = np.random.default_rng(0)
    C = 112 * 1024
    A = rng.standard_normal((C, 3, 3)).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2)
    A = jnp.array(A)

    t("eigh3 (112k)", jax.jit(eigh3), A)
    t("eigvalsh3 (112k)", jax.jit(eigvalsh3), A)

    N = 4096
    keys = jnp.array(rng.integers(-100, 100, (N, 3)), jnp.int32)
    valid = jnp.ones((N,), bool)
    t("dedup_keys (4096->4096)", jax.jit(
        lambda k, v: vh.dedup_keys(k, v, 4096)), keys, valid)

    Ct = 1 << 16
    tk, occ = vh.empty_table(Ct)
    uniq, uvalid, inv = vh.dedup_keys(keys, valid, 4096)
    t("vh.insert (4096 into 64k)", jax.jit(vh.insert), tk, occ, uniq, uvalid)
    tk2, occ2, _ = vh.insert(tk, occ, uniq, uvalid)
    t("vh.lookup (4096 in 64k)", jax.jit(vh.lookup), tk2, occ2, keys, valid)

    # scatter-add segment reduce (the insert moment accumulation)
    pts = jnp.array(rng.standard_normal((N, 3)), jnp.float32)
    seg = jnp.array(rng.integers(0, Ct, N), jnp.int32)

    def scat(seg, pts):
        w = jnp.ones((N,))
        nn = jnp.zeros((Ct,)).at[seg].add(w, mode="drop")
        sp = jnp.zeros((Ct, 3)).at[seg].add(pts, mode="drop")
        SS = jnp.zeros((Ct, 3, 3)).at[seg].add(
            pts[:, :, None] * pts[:, None, :], mode="drop")
        return nn, sp, SS
    t("scatter moments (4096->64k)", jax.jit(scat), seg, pts)

    # gather from (C,W) cluster
    win = cl.Cluster.empty((Ct, 10))
    idx = jnp.array(rng.integers(0, Ct, 1024), jnp.int32)
    t("cluster gather (1024 of 64k)", jax.jit(
        lambda w, i: jax.tree.map(lambda a: a[i], w)), win, idx)

    # small dense solve in a loop (the LM inner)
    H = jnp.array(rng.standard_normal((150, 150)), jnp.float32)
    H = H @ H.T + 150 * jnp.eye(150)
    g = jnp.array(rng.standard_normal(150), jnp.float32)
    t("solve 150x150", jax.jit(jnp.linalg.solve), H, g)
    t("inv 15x15", jax.jit(jnp.linalg.inv), H[:15, :15])


if __name__ == "__main__":
    main()
