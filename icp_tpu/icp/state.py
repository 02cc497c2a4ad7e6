"""ICP iteration state.

The reference tracks incremental (R_k, q_k, t_k, s_k) and accumulated
(R, q, t, s) Eigen objects on the host plus the device-side T buffer
(include/ICP/algorithms.hpp:1682-1700). Here the whole per-iteration state is
one small pytree that lives on device for the entire registration.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from icp_tpu.icp.quaternion import pack_T, qidentity


class ICPState(NamedTuple):
    """Accumulated + incremental transform state.

    q, t, s: accumulated similarity (moving -> fixed): p' = s R(q) p + t.
    qk, tk, sk: the last iteration's incremental transform.
    k: completed iterations.
    """

    q: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    qk: jnp.ndarray
    tk: jnp.ndarray
    sk: jnp.ndarray
    k: jnp.ndarray

    @property
    def T(self) -> jnp.ndarray:
        """Reference T-buffer layout [qx,qy,qz,qw, tx,ty,tz,s]."""
        return pack_T(self.q, self.t, self.s)


def identity_state(dtype=jnp.float32) -> ICPState:
    """Identity transform, pre-first-iteration (reference cpp:3295-3298)."""
    return ICPState(
        q=qidentity(dtype),
        t=jnp.zeros((3,), dtype),
        s=jnp.ones((), dtype),
        qk=qidentity(dtype),
        tk=jnp.full((3,), jnp.inf, dtype),  # "not converged yet"
        sk=jnp.ones((), dtype),
        k=jnp.zeros((), jnp.int32),
    )
