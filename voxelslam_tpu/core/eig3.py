"""Batched closed-form eigendecomposition of symmetric 3x3 matrices.

The reference eigen-decomposes 3x3 covariances at many sites (plane
detection, BA factor, marginalization, degeneracy gates — e.g.
voxel_map.hpp:312,1416,1525; voxelslam.cpp:743,1090 in the reference
tree). On TPU we need this batched over 10^4-10^5 voxels per step, so we
use the analytic trigonometric method (no iteration, pure VPU math)
instead of a LAPACK-style solver.

Eigenvalues ascend (w0 <= w1 <= w2) to match Eigen's
SelfAdjointEigenSolver convention used throughout the reference.

A custom JVP implements the standard first-order perturbation formulas
    d lambda_k = u_k^T dA u_k
    d u_k      = sum_{j != k} (u_j^T dA u_k) / (lambda_k - lambda_j) u_j
with clamped gaps, so the BA factor can be differentiated (the same
1/(lambda_0 - lambda_j) structure the reference builds by hand in
voxel_map.hpp:199-201).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_GAP_EPS = 1e-9


def eigvalsh3(A: jnp.ndarray) -> jnp.ndarray:
    """Eigenvalues (ascending) of symmetric (..., 3, 3) matrices."""
    q = (A[..., 0, 0] + A[..., 1, 1] + A[..., 2, 2]) / 3.0
    B = A - q[..., None, None] * jnp.eye(3, dtype=A.dtype)
    # p2 = sum of squares of B / 6
    p2 = jnp.sum(B * B, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    safe_p = jnp.maximum(p, 1e-30)
    Bn = B / safe_p[..., None, None]
    detBn = (
        Bn[..., 0, 0] * (Bn[..., 1, 1] * Bn[..., 2, 2] - Bn[..., 1, 2] * Bn[..., 2, 1])
        - Bn[..., 0, 1] * (Bn[..., 1, 0] * Bn[..., 2, 2] - Bn[..., 1, 2] * Bn[..., 2, 0])
        + Bn[..., 0, 2] * (Bn[..., 1, 0] * Bn[..., 2, 1] - Bn[..., 1, 1] * Bn[..., 2, 0])
    )
    r = jnp.clip(detBn * 0.5, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    two_pi_3 = 2.0943951023931953
    w2 = q + 2.0 * p * jnp.cos(phi)
    w0 = q + 2.0 * p * jnp.cos(phi + two_pi_3)
    w1 = 3.0 * q - w0 - w2
    return jnp.stack([w0, w1, w2], axis=-1)


def _eigvec_for(A: jnp.ndarray, lam: jnp.ndarray, lam_others: jnp.ndarray) -> jnp.ndarray:
    """Eigenvector for eigenvalue `lam` via the adjugate/cross-product method.

    (A - l1 I)(A - l2 I) has columns proportional to the eigenvector of the
    remaining eigenvalue (Cayley-Hamilton); pick the largest column for
    numerical robustness. Degenerate pairs are handled by the caller.
    """
    I = jnp.eye(3, dtype=A.dtype)
    M = (A - lam_others[..., 0, None, None] * I) @ (A - lam_others[..., 1, None, None] * I)
    # Pick the column with the largest norm — as a one-hot contraction:
    # take_along_axis lowers to a serializing gather on TPU (measured
    # ~0.6 ms per instance at F=1024 inside the LM loop); the iota-
    # compare one-hot + tiny matmul stays a fused vector op.
    norms = jnp.sum(M * M, axis=-2)  # (..., 3) column squared norms
    oh = jax.nn.one_hot(jnp.argmax(norms, axis=-1), 3, dtype=A.dtype)
    v = jnp.einsum("...ij,...j->...i", M, oh)
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.maximum(n, 1e-30)


@jax.custom_jvp
def eigh3(A: jnp.ndarray):
    """Eigen-decomposition of symmetric (..., 3, 3): returns (w, V).

    w: (..., 3) ascending eigenvalues. V: (..., 3, 3) with V[..., :, k] the
    unit eigenvector for w[..., k] (Eigen column convention).
    """
    A = (A + jnp.swapaxes(A, -1, -2)) * 0.5
    w = eigvalsh3(A)
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=-1), 1e-30)

    # v2 from (A-w0)(A-w1); v0 from (A-w1)(A-w2). Robust when the target
    # eigenvalue is isolated; the isotropic/degenerate case falls back to
    # an orthonormal completion below.
    v2 = _eigvec_for(A, w[..., 2], w[..., [0, 1]])
    v0 = _eigvec_for(A, w[..., 0], w[..., [1, 2]])

    gap_lo = (w[..., 1] - w[..., 0]) / scale  # isolation of w0
    gap_hi = (w[..., 2] - w[..., 1]) / scale  # isolation of w2
    # If w0 is nearly degenerate with w1, v0 from the product is unreliable;
    # build it orthogonal to v2 instead (and vice versa).
    use_v2 = gap_hi >= gap_lo

    # Orthonormal completion: given a unit vector u, find t orthogonal to it.
    def _ortho(u):
        # Pick the axis least aligned with u.
        a = jnp.abs(u)
        idx = jnp.argmin(a, axis=-1)
        e = jax.nn.one_hot(idx, 3, dtype=u.dtype)
        t = jnp.cross(u, e)
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-30)

    # Where the anchor is v2: recompute v0 as the best vector orthogonal to
    # v2 (project A-w0 kernel search); cheap robust choice: Gram-Schmidt the
    # product-method v0 against v2, falling back to an arbitrary orthogonal.
    def _orthogonalize(v, anchor):
        v = v - jnp.sum(v * anchor, axis=-1, keepdims=True) * anchor
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        fallback = _ortho(anchor)
        ok = n[..., 0] > 1e-8
        v = jnp.where(ok[..., None], v / jnp.maximum(n, 1e-30), fallback)
        return v

    v0_a = _orthogonalize(v0, v2)          # anchor = v2
    v2_b = _orthogonalize(v2, v0)          # anchor = v0
    v0f = jnp.where(use_v2[..., None], v0_a, v0)
    v2f = jnp.where(use_v2[..., None], v2, v2_b)
    v1 = jnp.cross(v2f, v0f)
    n1 = jnp.linalg.norm(v1, axis=-1, keepdims=True)
    v1 = v1 / jnp.maximum(n1, 1e-30)

    # Fully isotropic fallback (all gaps ~ 0): identity basis.
    iso = ((w[..., 2] - w[..., 0]) / scale < 1e-12)[..., None]
    e0 = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], A.dtype), v0f.shape)
    e1 = jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0], A.dtype), v0f.shape)
    e2 = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], A.dtype), v0f.shape)
    v0f = jnp.where(iso, e0, v0f)
    v1 = jnp.where(iso, e1, v1)
    v2f = jnp.where(iso, e2, v2f)

    V = jnp.stack([v0f, v1, v2f], axis=-1)

    # Rayleigh-quotient refinement: the trig eigenvalues lose ~sqrt(eps)
    # accuracy through acos near degenerate pairs; w_k = v_k^T A v_k
    # restores full f32 accuracy given decent eigenvectors.
    w_r = jnp.einsum("...ik,...ij,...jk->...k", V, A, V)
    # sort the 3 eigenpairs via a one-hot permutation matrix instead of
    # take_along_axis (gathers serialize on TPU; P is a (3,3) matmul)
    order = jnp.argsort(w_r, axis=-1)
    P = jax.nn.one_hot(order, 3, dtype=A.dtype, axis=-2)  # P[..., s, d]
    w_r = jnp.einsum("...s,...sd->...d", w_r, P)
    V = V @ P
    return w_r, V


@eigh3.defjvp
def _eigh3_jvp(primals, tangents):
    (A,) = primals
    (dA,) = tangents
    w, V = eigh3(A)
    dA = (dA + jnp.swapaxes(dA, -1, -2)) * 0.5
    # S = V^T dA V
    S = jnp.swapaxes(V, -1, -2) @ dA @ V
    dw = jnp.stack([S[..., 0, 0], S[..., 1, 1], S[..., 2, 2]], axis=-1)
    # dV[:, k] = sum_{j!=k} S[j, k] / (w_k - w_j) * V[:, j]
    gaps = w[..., None, :] - w[..., :, None]  # gaps[j, k] = w_k - w_j
    inv_gaps = jnp.where(
        jnp.abs(gaps) > _GAP_EPS, 1.0 / jnp.where(jnp.abs(gaps) > _GAP_EPS, gaps, 1.0), 0.0
    )
    coeff = S * inv_gaps  # (..., j, k)
    # zero the diagonal
    coeff = coeff * (1.0 - jnp.eye(3, dtype=A.dtype))
    dV = V @ coeff
    return (w, V), (dw, dV)
