"""Batched SO(3) primitives in f32.

Capability parity with the reference math core (tools.hpp:51-133 in the
reference tree): Rodrigues exp, matrix log, hat, right Jacobian and its
inverse — but written as branchless, arbitrarily-batched jnp functions so
they vmap/jit cleanly and map onto the TPU VPU.

All small-angle branches are implemented with `jnp.where` over Taylor
expansions (never data-dependent Python control flow).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def hat(v: jnp.ndarray) -> jnp.ndarray:
    """Skew-symmetric matrix of v, batched: (..., 3) -> (..., 3, 3)."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zero = jnp.zeros_like(x)
    rows = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def vee(M: jnp.ndarray) -> jnp.ndarray:
    """Inverse of hat: (..., 3, 3) -> (..., 3)."""
    return jnp.stack(
        [M[..., 2, 1] - M[..., 1, 2],
         M[..., 0, 2] - M[..., 2, 0],
         M[..., 1, 0] - M[..., 0, 1]],
        axis=-1,
    ) * 0.5



def _safe_norm(v: jnp.ndarray) -> jnp.ndarray:
    """Norm over the last axis that is differentiable at 0 (adds a tiny
    bias ~1e-12 to the squared norm; forward error is negligible and the
    gradient at v = 0 is 0 instead of NaN)."""
    return jnp.sqrt(jnp.sum(v * v, axis=-1) + 1e-24)

def _sinc(x: jnp.ndarray) -> jnp.ndarray:
    """sin(x)/x with Taylor fallback."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)  # avoid 0/0 in the false branch
    return jnp.where(small, 1.0 - x * x / 6.0, jnp.sin(xs) / xs)


def _cosc(x: jnp.ndarray) -> jnp.ndarray:
    """(1 - cos(x)) / x^2 with Taylor fallback."""
    small = jnp.abs(x) < 1e-4
    xs = jnp.where(small, 1.0, x)
    return jnp.where(small, 0.5 - x * x / 24.0, (1.0 - jnp.cos(xs)) / (xs * xs))


def exp(w: jnp.ndarray) -> jnp.ndarray:
    """SO(3) exponential map (Rodrigues), batched: (..., 3) -> (..., 3, 3)."""
    theta = _safe_norm(w)[..., None]
    th = theta[..., None]  # (..., 1, 1)
    K = hat(w)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return I + _sinc(th) * K + _cosc(th) * K2


def quat_from_matrix(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), batched.

    Shepperd's method, branchless: build all four candidates and select
    the one anchored on the largest diagonal quantity (robust near pi).
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def _cand(t, a, b, c, d):
        s = jnp.sqrt(jnp.maximum(t, 1e-20)) * 2.0  # anchor scale
        return jnp.stack([a / s, b / s, c / s, d / s], axis=-1), s

    qw, sw = _cand(1.0 + tr, (1.0 + tr) * 1.0, m21 - m12, m02 - m20, m10 - m01)
    qx, sx = _cand(1.0 + m00 - m11 - m22, m21 - m12,
                   (1.0 + m00 - m11 - m22) * 1.0, m01 + m10, m02 + m20)
    qy, sy = _cand(1.0 - m00 + m11 - m22, m02 - m20, m01 + m10,
                   (1.0 - m00 + m11 - m22) * 1.0, m12 + m21)
    qz, sz = _cand(1.0 - m00 - m11 + m22, m10 - m01, m02 + m20, m12 + m21,
                   (1.0 - m00 - m11 + m22) * 1.0)

    scales = jnp.stack([sw, sx, sy, sz], axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4, 4)
    k = jnp.argmax(scales, axis=-1)
    q = jnp.take_along_axis(cands, k[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    q = q / _safe_norm(q)[..., None]
    return q


def log(R: jnp.ndarray) -> jnp.ndarray:
    """SO(3) logarithm, batched: (..., 3, 3) -> (..., 3).

    Quaternion route (accurate at all angles, including near pi where the
    trace formula loses the axis): w = 2 atan2(|q_v|, q_w) * q_v / |q_v|.
    """
    q = quat_from_matrix(R)
    qw = q[..., 0]
    qv = q[..., 1:]
    # map to positive hemisphere so the angle is in [0, pi]
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qw = qw * sign
    qv = qv * sign[..., None]
    n = _safe_norm(qv)
    theta = 2.0 * jnp.arctan2(n, qw)
    # w = theta * qv / n, with small-angle fallback theta/n -> 2/qw
    small = n < 1e-6
    scale = jnp.where(small, 2.0 / jnp.maximum(qw, 1e-12),
                      theta / jnp.where(small, 1.0, n))
    return qv * scale[..., None]


def jr(w: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian of SO(3), batched: (..., 3) -> (..., 3, 3).

    J_r(w) = I - (1-cos t)/t^2 [w]x + (t - sin t)/t^3 [w]x^2
    """
    theta = _safe_norm(w)
    th = theta[..., None, None]
    K = hat(w)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    small = th < 1e-4
    ths = jnp.where(small, 1.0, th)
    c1 = jnp.where(small, 0.5 - th * th / 24.0, (1.0 - jnp.cos(ths)) / (ths * ths))
    c2 = jnp.where(small, 1.0 / 6.0 - th * th / 120.0,
                   (ths - jnp.sin(ths)) / (ths * ths * ths))
    return I - c1 * K + c2 * K2


def jr_inv(w: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian of SO(3), batched: (..., 3) -> (..., 3, 3).

    J_r^{-1}(w) = I + 1/2 [w]x + (1/t^2 - (1+cos t)/(2 t sin t)) [w]x^2
    """
    theta = _safe_norm(w)
    th = theta[..., None, None]
    K = hat(w)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    small = th < 1e-4
    ths = jnp.where(small, 1.0, th)
    c = jnp.where(
        small,
        1.0 / 12.0 + th * th / 720.0,
        1.0 / (ths * ths) - (1.0 + jnp.cos(ths)) / (2.0 * ths * jnp.sin(ths)),
    )
    return I + 0.5 * K + c * K2


def jr_inv_R(R: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian evaluated at log(R) (reference: tools.hpp:118)."""
    return jr_inv(log(R))
