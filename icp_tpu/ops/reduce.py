"""Row-wise reductions — parity API for the reference's generic ``Reduce``.

The reference implements two-phase local-memory tree reductions
(``reduce_min_f``, ``reduce_max_ui``, ``reduce_sum_f``/``reduce_sum_fd``,
reference kernels/reduce_kernels.cl:67-264, class ``Reduce<MIN/MAX/SUM, T>``
src/ICP/algorithms.cpp:53-330). On TPU a row reduce is a single fused XLA
reduction; these wrappers keep the reference's operation surface (and its
f32 -> f64 promotion variant) available to callers and tests.
"""

from __future__ import annotations

import jax.numpy as jnp


def reduce_min(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Row-wise minimum (reference ``Reduce<MIN, float>``)."""
    return jnp.min(x, axis=axis)


def reduce_max(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Row-wise maximum (reference ``Reduce<MAX, uint>``)."""
    return jnp.max(x, axis=axis)


def reduce_sum(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Row-wise sum (reference ``Reduce<SUM, float>`` — the workhorse behind
    the S-matrix reduction)."""
    return jnp.sum(x, axis=axis)


def reduce_sum_fd(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Row-wise sum with promotion toward f64 where available.

    Mirrors ``reduce_sum_fd`` (float in, double out;
    kernels/icp_kernels.cl:294-329). On TPU (no native f64) XLA computes in
    f32; on CPU test backends with x64 enabled this matches the reference's
    double accumulation.
    """
    return jnp.sum(x.astype(jnp.promote_types(x.dtype, jnp.float64)), axis=axis)
