"""15-DoF navigation state as a JAX pytree.

Mirrors the reference's `IMUST` (tools.hpp:135-199 in the reference
tree): rotation R, position p, velocity v, gyro/accel biases bg/ba, the
(shared) gravity vector g, timestamp t and a 15x15 covariance, with a
manifold boxplus/boxminus in the order [dR, dp, dv, dbg, dba].

All fields carry arbitrary leading batch dimensions, so a sliding window
of states is simply a NavState whose leaves have a leading axis of size
`win_size` — the natural struct-of-arrays layout for TPU.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp

from . import so3

DIM = 15          # error-state dimension (reference tools.hpp:16)
GRAVITY = 9.8     # G_m_s2 (reference tools.hpp:15)


@partial(jax.tree_util.register_dataclass,
         data_fields=["R", "p", "v", "bg", "ba", "g", "t", "cov"],
         meta_fields=[])
@dataclasses.dataclass
class NavState:
    R: jnp.ndarray   # (..., 3, 3)
    p: jnp.ndarray   # (..., 3)
    v: jnp.ndarray   # (..., 3)
    bg: jnp.ndarray  # (..., 3)
    ba: jnp.ndarray  # (..., 3)
    g: jnp.ndarray   # (..., 3)
    t: jnp.ndarray   # (...)
    cov: jnp.ndarray  # (..., 15, 15)

    @staticmethod
    def identity(batch_shape=(), dtype=jnp.float32) -> "NavState":
        """Zero state with the reference's default prior covariance
        (tools.hpp:188-197): 1e-4 I, biases 1e-5 I."""
        bs = tuple(batch_shape)
        cov = jnp.eye(DIM, dtype=dtype) * 1e-4
        cov = cov.at[9:, 9:].set(jnp.eye(6, dtype=dtype) * 1e-5)
        return NavState(
            R=jnp.broadcast_to(jnp.eye(3, dtype=dtype), bs + (3, 3)),
            p=jnp.zeros(bs + (3,), dtype),
            v=jnp.zeros(bs + (3,), dtype),
            bg=jnp.zeros(bs + (3,), dtype),
            ba=jnp.zeros(bs + (3,), dtype),
            g=jnp.broadcast_to(jnp.array([0.0, 0.0, -GRAVITY], dtype), bs + (3,)),
            t=jnp.zeros(bs, dtype),
            cov=jnp.broadcast_to(cov, bs + (DIM, DIM)),
        )

    def boxplus(self, dx: jnp.ndarray) -> "NavState":
        """Right-multiplicative manifold update; dx: (..., 15).

        R <- R Exp(dx[0:3]); p,v,bg,ba additive (reference IMUST::operator+=).
        """
        return dataclasses.replace(
            self,
            R=self.R @ so3.exp(dx[..., 0:3]),
            p=self.p + dx[..., 3:6],
            v=self.v + dx[..., 6:9],
            bg=self.bg + dx[..., 9:12],
            ba=self.ba + dx[..., 12:15],
        )

    def boxminus(self, other: "NavState") -> jnp.ndarray:
        """self [-] other -> (..., 15) (reference IMUST::operator-)."""
        return jnp.concatenate(
            [
                so3.log(jnp.swapaxes(other.R, -1, -2) @ self.R),
                self.p - other.p,
                self.v - other.v,
                self.bg - other.bg,
                self.ba - other.ba,
            ],
            axis=-1,
        )

    def __getitem__(self, idx) -> "NavState":
        """Index/slice the leading batch axis of every leaf."""
        return jax.tree.map(lambda x: x[idx], self)


def stack_states(states) -> NavState:
    """Stack a python list of NavState into one batched NavState."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *states)
