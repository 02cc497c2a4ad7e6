"""Photogeometric 8-D distance computation.

The reference's metric (``euclideanSquaredMetric8`` from its RandomBallCover
dependency, referenced at src/ICP/algorithms.cpp:3203-3208) blends the
geometric and photometric halves of the 8-D points:

    d^2(x, x') = ||x_g - x'_g||^2 + alpha * ||x_p - x'_p||^2

where x_g = (x, y, z) is in the cloud's length unit (mm for Kinect) and
x_p = (r, g, b) in [0, 1]; alpha (default 1e2, apps 2e2) scales color
differences up to be commensurate with millimeter-scale geometry. The
homogeneous components (indices 3 and 7, both 1) cancel in differences.

TPU-first design: pairwise distance matrices are computed via the quadratic
expansion ``d^2 = |a|^2 + |b|^2 - 2 a.b`` so the O(m*n) work lands on the MXU
as a matmul instead of a broadcast-subtract (which would materialize an
(m, n, 8) intermediate in HBM).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def metric_weights(alpha, dtype=jnp.float32) -> jnp.ndarray:
    """Per-dimension weights [1,1,1,0, alpha,alpha,alpha, 0] of the metric."""
    one = jnp.ones((), dtype)
    zero = jnp.zeros((), dtype)
    a = jnp.asarray(alpha, dtype)
    return jnp.stack([one, one, one, zero, a, a, a, zero])


def pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray, alpha) -> jnp.ndarray:
    """Blended squared distances between two 8-D point sets.

    Args:
      a: (m, 8) points.
      b: (n, 8) points.
      alpha: photometric blend weight (traced scalar ok).
    Returns:
      (m, n) float32 matrix of blended squared distances (clamped >= 0).
    """
    # Distances are invariant under a common translation; centering on b's
    # centroid shrinks |p|^2 by orders of magnitude, which directly shrinks
    # the f32 cancellation error of the quadratic expansion (coords ~2000 mm
    # would otherwise give |p|^2 ~ 4e6 and ~0.5 absolute error in d^2).
    center = jnp.mean(b, axis=0)
    a = a - center
    b = b - center
    w = metric_weights(alpha, a.dtype)
    aw = a * w  # weighted once; cross term needs w exactly once
    sq_a = jnp.sum(aw * a, axis=-1)  # sum w * a^2
    sq_b = jnp.sum((b * w) * b, axis=-1)
    # Full-f32 MXU passes: the quadratic expansion cancels ~|p|^2-magnitude
    # terms down to ~|dp|^2, so bf16 matmul (the TPU default) would destroy
    # the NN ordering for nearby correspondences.
    cross = jnp.dot(aw, b.T, precision=jax.lax.Precision.HIGHEST)
    d2 = sq_a[:, None] + sq_b[None, :] - 2.0 * cross
    return jnp.maximum(d2, 0.0)


def point_sq_dists(a: jnp.ndarray, b: jnp.ndarray, alpha) -> jnp.ndarray:
    """Blended squared distances between aligned point pairs.

    Args:
      a, b: (n, 8) aligned sets.
    Returns:
      (n,) blended squared distances.
    """
    w = metric_weights(alpha, a.dtype)
    d = a - b
    return jnp.sum(w * d * d, axis=-1)


def nearest_neighbor_brute(queries: jnp.ndarray, database: jnp.ndarray, alpha):
    """Exact NN via the full distance matrix (reference config 1 baseline).

    Returns:
      (nn_idx (m,) int32, nn_dist (m,) squared blended distance).
    """
    d2 = pairwise_sq_dists(queries, database, alpha)
    nn_idx = jnp.argmin(d2, axis=-1).astype(jnp.int32)
    nn_dist = jnp.min(d2, axis=-1)
    return nn_idx, nn_dist
