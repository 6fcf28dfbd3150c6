"""Probe: does pinning layouts fix the slow window-slot DUS inside a
megastep-like fused graph?

Replicates the structure: carried (W, C, 3, 3)/(W, C, 3)/(W, C) window
arrays, per-iteration scatter-add into slot W-1 voxels + a DUS write +
a consumer that reduces over W (the plane refresh).  Times three
variants: (a) as-is, (b) with_layout_constraint(default) around the
window arrays, (c) component-packed (W, 6, C) storage.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout, with_layout_constraint

    W, C, N = 10, 1 << 16, 4096
    rng = np.random.default_rng(0)
    S = jnp.array(rng.standard_normal((W, C, 3, 3)), jnp.float32)
    mu = jnp.array(rng.standard_normal((W, C, 3)), jnp.float32)
    n = jnp.array(rng.random((W, C)), jnp.float32)
    seg = jnp.array(rng.integers(0, C, N), jnp.int32)
    pts = jnp.array(rng.standard_normal((N, 3)), jnp.float32)
    R = jnp.array(np.eye(3), jnp.float32)
    p = jnp.zeros(3, jnp.float32)

    def step(S, mu, n, seg, pts, R, p):
        # scatter new scan into slot W-1 (like insert_scan)
        dS = jnp.zeros((C, 3, 3)).at[seg].add(
            pts[:, :, None] * pts[:, None, :], mode="drop")
        dmu = jnp.zeros((C, 3)).at[seg].add(pts, mode="drop")
        dn = jnp.zeros((C,)).at[seg].add(1.0, mode="drop")
        S = S.at[W - 1].add(dS)
        mu = mu.at[W - 1].add(dmu)
        n = n.at[W - 1].add(dn)
        # consumer: refresh = world-transform + reduce over W
        Rmu = jnp.einsum("ij,wcj->wci", R, mu) + p * n[..., None]
        S2 = jnp.einsum("ij,wcjk,lk->wcil", R, S, R)
        tot_S = S2.sum(0)
        tot_mu = Rmu.sum(0)
        tot_n = n.sum(0)
        lam = jnp.linalg.eigvalsh(
            tot_S / jnp.maximum(tot_n, 1)[:, None, None]
            - (tot_mu / jnp.maximum(tot_n, 1)[:, None])[:, :, None]
            * (tot_mu / jnp.maximum(tot_n, 1)[:, None])[:, None, :])
        return S, mu, n, lam

    dev = jax.devices()[0]
    sds = jax.sharding.SingleDeviceSharding(dev)

    def step_pin(S, mu, n, seg, pts, R, p):
        dflt4 = Layout((0, 1, 2, 3))
        dflt3 = Layout((0, 1, 2))
        dflt2 = Layout((0, 1))
        S = with_layout_constraint(S, dflt4)
        mu = with_layout_constraint(mu, dflt3)
        n = with_layout_constraint(n, dflt2)
        S, mu, n, lam = step(S, mu, n, seg, pts, R, p)
        S = with_layout_constraint(S, dflt4)
        mu = with_layout_constraint(mu, dflt3)
        n = with_layout_constraint(n, dflt2)
        return S, mu, n, lam

    # component-packed: Sp (W, 6, C), mup (W, 3, C), n (W, C)
    Sp = jnp.array(rng.standard_normal((W, 6, C)), jnp.float32)
    mup = jnp.array(rng.standard_normal((W, 3, C)), jnp.float32)

    def step_packed(Sp, mup, n, seg, pts, R, p):
        px, py, pz = pts[:, 0], pts[:, 1], pts[:, 2]
        comps = [px * px, py * py, pz * pz, px * py, px * pz, py * pz]
        dS = jnp.zeros((6, C))
        for i, c in enumerate(comps):
            dS = dS.at[i, seg].add(c, mode="drop")
        dmu = jnp.zeros((3, C))
        for i in range(3):
            dmu = dmu.at[i, seg].add(pts[:, i], mode="drop")
        dn = jnp.zeros((C,)).at[seg].add(1.0, mode="drop")
        Sp = Sp.at[W - 1].add(dS)
        mup = mup.at[W - 1].add(dmu)
        n = n.at[W - 1].add(dn)
        # consumer: reduce over W, unpack, eig
        xx, yy, zz, xy, xz, yz = [Sp[:, i].sum(0) for i in range(6)]
        m = [mup[:, i].sum(0) for i in range(3)]
        tn = jnp.maximum(n.sum(0), 1)
        Sm = jnp.stack([jnp.stack([xx, xy, xz], -1),
                        jnp.stack([xy, yy, yz], -1),
                        jnp.stack([xz, yz, zz], -1)], -2) / tn[:, None, None]
        mu3 = jnp.stack(m, -1) / tn[:, None]
        lam = jnp.linalg.eigvalsh(Sm - mu3[:, :, None] * mu3[:, None, :])
        return Sp, mup, n, lam

    j_a = jax.jit(step, donate_argnums=(0, 1, 2))
    j_b = jax.jit(step_pin, donate_argnums=(0, 1, 2))
    j_c = jax.jit(step_packed, donate_argnums=(0, 1, 2))

    for name, fn, st in [("as-is", j_a, (S, mu, n)),
                         ("pinned", j_b, (jnp.array(S), jnp.array(mu),
                                          jnp.array(n))),
                         ("packed", j_c, (Sp, mup, jnp.array(n)))]:
        a, b, c = st
        a, b, c, lam = fn(a, b, c, seg, pts, R, p)
        jax.block_until_ready(lam)
        t0 = time.time()
        it = 20
        for _ in range(it):
            a, b, c, lam = fn(a, b, c, seg, pts, R, p)
        jax.block_until_ready(lam)
        print(f"{name:8s} {(time.time()-t0)/it*1e3:8.2f} ms/iter", flush=True)


if __name__ == "__main__":
    main()
