"""Point-to-plane ICP for loop verification.

Capability parity with the reference `icp_normal`
(loop_refine.hpp:47-145 in the reference tree): Gauss-Newton over a
6-DoF relative pose, plane fits from 5-NN in the target cloud,
coarse-to-fine distance gates, and the success criterion
min-eig(sum n n^T) > icp_eigval AND converged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import so3
from ..core.eig3 import eigvalsh3
from ..ops import knn as knn_ops


def icp_point_to_plane(src: jnp.ndarray, src_mask: jnp.ndarray,
                       tgt: jnp.ndarray, tgt_mask: jnp.ndarray,
                       R0: jnp.ndarray, t0: jnp.ndarray,
                       iters: int = 20, icp_eigval: float = 14.0,
                       gate_coarse: float = 1.0, gate_fine: float = 0.3):
    """Align src onto tgt starting from (R0, t0).

    Returns dict(R, t, ok, eig0, mean_abs_dist). The distance gate starts
    at gate_coarse and tightens to gate_fine over the iterations
    (reference's coarse->fine schedule).
    """
    n_src = src.shape[0]

    def body(carry, k):
        R, t = carry
        wld = src @ R.T + t
        pf = knn_ops.plane_fit_nn(wld, tgt, tgt_mask)
        d = jnp.einsum("ni,ni->n", pf["normal"], wld) + pf["d"]
        gate = gate_coarse + (gate_fine - gate_coarse) * (k / max(iters - 1, 1))
        ok = pf["valid"] & (src_mask > 0) & (jnp.abs(d) < gate)
        w = ok.astype(src.dtype)
        nrm = pf["normal"]
        phat = so3.hat(src)
        jac_r = jnp.einsum("nij,jk,nk->ni", phat, R.T, nrm)
        jac = jnp.concatenate([jac_r, nrm], axis=-1)
        H = jnp.einsum("n,ni,nj->ij", w, jac, jac) + 1e-6 * jnp.eye(6)
        g = jnp.einsum("n,ni,n->i", w, jac, d)
        dx = jnp.linalg.solve(H, -g)
        R2 = R @ so3.exp(dx[0:3])
        t2 = t + dx[3:6]
        stats = (jnp.einsum("n,ni,nj->ij", w, nrm, nrm),
                 jnp.sum(w * jnp.abs(d)) / jnp.maximum(jnp.sum(w), 1.0),
                 jnp.linalg.norm(dx))
        return (R2, t2), stats

    (R, t), (nnts, mads, dxs) = jax.lax.scan(
        body, (R0, t0), jnp.arange(iters, dtype=jnp.float32))
    ev = eigvalsh3(nnts[-1])
    # last-step norm; 1e-2 sits above the f32 + plane-refit jitter floor
    # while still rejecting genuinely unconverged alignments
    converged = dxs[-1] < 1e-2
    ok = (ev[0] > icp_eigval) & converged
    return dict(R=R, t=t, ok=ok, eig0=ev[0], mean_abs_dist=mads[-1],
                converged=converged)
