"""Validate the packed-slab layout hypothesis on the current backend.

Compares (a) dynamic-update-slice of one window slot, (b) full-window
reduction (refresh-like), (c) keys-row gathers, in the current
AoS-layout vs the packed (W, comp, C) / (3, C) layout.
"""
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
    print(f"{name:44s} {(time.time()-t0)/reps*1e3:8.3f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    C = 1 << 16
    W = 10
    rng = np.random.default_rng(0)

    # --- (a) window slot update -------------------------------------------
    win_aos_mu = jnp.array(rng.standard_normal((C, W, 3)), jnp.float32)
    win_aos_S = jnp.array(rng.standard_normal((C, W, 3, 3)), jnp.float32)
    new_mu = jnp.array(rng.standard_normal((C, 3)), jnp.float32)
    new_S = jnp.array(rng.standard_normal((C, 3, 3)), jnp.float32)
    slot = jnp.int32(3)

    def dus_aos(mu, S, nm, nS, s):
        return mu.at[:, s].set(nm), S.at[:, s].set(nS)

    win_pk = jnp.array(rng.standard_normal((W, 11, C)), jnp.float32)
    new_pk = jnp.array(rng.standard_normal((11, C)), jnp.float32)

    def dus_packed(wp, np_, s):
        return wp.at[s].set(np_)

    t("DUS slot AoS (C,W,3)+(C,W,3,3)", jax.jit(dus_aos),
      win_aos_mu, win_aos_S, new_mu, new_S, slot)
    t("DUS slot packed (W,11,C)", jax.jit(dus_packed), win_pk, new_pk, slot)

    # --- (b) refresh-like reduction over W ---------------------------------
    Rs = jnp.array(rng.standard_normal((W, 3, 3)), jnp.float32)
    ps = jnp.array(rng.standard_normal((W, 3)), jnp.float32)

    def refresh_aos(mu, S, Rs, ps):
        tot_S = jnp.zeros((C, 3, 3))
        tot_mu = jnp.zeros((C, 3))
        for i in range(W):
            m = jnp.einsum("ij,cj->ci", Rs[i], mu[:, i]) + ps[i]
            s = jnp.einsum("ij,cjk,lk->cil", Rs[i], S[:, i], Rs[i])
            tot_S = tot_S + s
            tot_mu = tot_mu + m
        return tot_S, tot_mu

    def refresh_packed(wp, Rs, ps):
        # rows: n, mu(3), S6, tr
        tot = jnp.zeros((11, C))
        for i in range(W):
            n = wp[i, 0]
            mu = wp[i, 1:4]
            xx, yy, zz, xy, xz, yz = (wp[i, 4], wp[i, 5], wp[i, 6],
                                      wp[i, 7], wp[i, 8], wp[i, 9])
            R = Rs[i]
            Sm = [[xx, xy, xz], [xy, yy, yz], [xz, yz, zz]]
            RS = [[sum(R[r, k] * Sm[k][c] for k in range(3))
                   for c in range(3)] for r in range(3)]
            RSRT = [[sum(RS[r][k] * R[c, k] for k in range(3))
                     for c in range(3)] for r in range(3)]
            mu2 = [sum(R[r, k] * mu[k] for k in range(3)) + ps[i, r]
                   for r in range(3)]
            rows = jnp.stack([
                n, mu2[0], mu2[1], mu2[2],
                RSRT[0][0], RSRT[1][1], RSRT[2][2],
                RSRT[0][1], RSRT[0][2], RSRT[1][2], wp[i, 10]])
            tot = tot + rows
        return tot

    t("refresh AoS", jax.jit(refresh_aos), win_aos_mu, win_aos_S, Rs, ps)
    t("refresh packed", jax.jit(refresh_packed), win_pk, Rs, ps)

    # --- (c) key gathers ----------------------------------------------------
    keys_aos = jnp.array(rng.integers(-100, 100, (C, 3)), jnp.int32)
    keys_pk = keys_aos.T.copy()
    idx = jnp.array(rng.integers(0, C, 4096), jnp.int32)

    t("gather keys AoS (C,3)[idx]", jax.jit(lambda k, i: k[i]),
      keys_aos, idx)
    t("gather keys packed (3,C)[:,idx]", jax.jit(lambda k, i: k[:, i]),
      keys_pk, idx)

    # --- (d) probe-round election scatter -----------------------------------
    q = 8192
    cand = jnp.array(rng.integers(0, C, q), jnp.int32)
    qidx = jnp.arange(q, dtype=jnp.int32)
    want = jnp.array(rng.random(q) < 0.5)

    def elect_scatter_aos(keys, cand, want):
        election = jnp.full((C,), q, jnp.int32).at[
            jnp.where(want, cand, C - 1)].min(
            jnp.where(want, qidx, q), mode="drop")
        won = want & (election[cand] == qidx)
        uq = jnp.where(won[:, None], jnp.zeros((q, 3), jnp.int32), keys[cand])
        keys = keys.at[jnp.where(won, cand, C)].set(uq, mode="drop")
        return keys

    def elect_scatter_packed(keys, cand, want):
        election = jnp.full((C,), q, jnp.int32).at[
            jnp.where(want, cand, C - 1)].min(
            jnp.where(want, qidx, q), mode="drop")
        won = want & (election[cand] == qidx)
        uq = jnp.where(won[None, :], jnp.zeros((3, q), jnp.int32),
                       keys[:, cand])
        keys = keys.at[:, jnp.where(won, cand, C)].set(uq, mode="drop")
        return keys

    t("election scatter AoS", jax.jit(elect_scatter_aos), keys_aos, cand, want)
    t("election scatter packed", jax.jit(elect_scatter_packed), keys_pk,
      cand, want)

    # --- (e) moment scatter-add ---------------------------------------------
    vals_aos = jnp.array(rng.standard_normal((4096, 3, 3)), jnp.float32)
    vals_pk = jnp.array(rng.standard_normal((11, 4096)), jnp.float32)
    seg = jnp.array(rng.integers(0, C, 4096), jnp.int32)

    t("scatter-add S AoS (C,3,3)", jax.jit(
        lambda v, s: jnp.zeros((C, 3, 3)).at[s].add(v)), vals_aos, seg)
    t("scatter-add packed (11,C)", jax.jit(
        lambda v, s: jnp.zeros((11, C)).at[:, s].add(v)), vals_pk, seg)


if __name__ == "__main__":
    main()
