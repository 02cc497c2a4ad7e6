"""SE(3) utilities for the pose-graph / bundle-adjustment backend.

No reference counterpart (the reference stops at frame-to-frame ICP); this
supports the keyframe odometry + pose-graph extension (BASELINE.json configs
4-5). Poses are (q (4,) [x,y,z,w], t (3,)) world-from-camera pairs; the
tangent space uses the common [rho (translation), phi (rotation)] ordering
with the first-order BCH approximations that pose-graph solvers use.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from icp_tpu.icp.quaternion import (
    qconj,
    qidentity,
    qmul,
    qnormalize,
    qrotate,
    quat_to_matrix,
)


class Pose(NamedTuple):
    q: jnp.ndarray  # (..., 4)
    t: jnp.ndarray  # (..., 3)

    @staticmethod
    def identity(dtype=jnp.float32):
        return Pose(qidentity(dtype), jnp.zeros((3,), dtype))


def compose(a: Pose, b: Pose) -> Pose:
    """a * b: apply b first, then a."""
    return Pose(qnormalize(qmul(a.q, b.q)), qrotate(a.q, b.t) + a.t)


def inverse(p: Pose) -> Pose:
    qi = qconj(p.q)
    return Pose(qi, -qrotate(qi, p.t))


def relative(a: Pose, b: Pose) -> Pose:
    """a^-1 * b — the transform taking b's frame into a's."""
    return compose(inverse(a), b)


def exp(xi: jnp.ndarray) -> Pose:
    """so(3)+translation exponential: xi = [rho(3), phi(3)] -> Pose.

    Uses the quaternion exponential for rotation and the (sufficient for
    small updates) approximation t = rho.
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    angle = jnp.linalg.norm(phi, axis=-1, keepdims=True)
    safe = jnp.where(angle > 1e-12, angle, 1.0)
    axis = phi / safe
    half = 0.5 * angle
    q = jnp.concatenate([jnp.sin(half) * axis, jnp.cos(half)], axis=-1)
    q = jnp.where(angle > 1e-12, q, qidentity())
    return Pose(q, rho)


def log(p: Pose) -> jnp.ndarray:
    """Pose -> [rho, phi] (inverse of :func:`exp` to first order)."""
    w = jnp.clip(p.q[..., 3], -1.0, 1.0)
    vec = p.q[..., :3]
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    angle = 2.0 * jnp.arctan2(norm[..., 0], w)
    safe = jnp.where(norm > 1e-12, norm, 1.0)
    phi = vec / safe * angle[..., None]
    phi = jnp.where(norm > 1e-12, phi, jnp.zeros_like(vec))
    return jnp.concatenate([p.t, phi], axis=-1)


def retract(p: Pose, xi: jnp.ndarray) -> Pose:
    """Left-multiplicative retraction: exp(xi) * p."""
    return compose(exp(xi), p)


def apply(p: Pose, points: jnp.ndarray) -> jnp.ndarray:
    """Transform (..., 3) points by the pose."""
    return qrotate(p.q, points) + p.t


def rotation_matrix(p: Pose) -> jnp.ndarray:
    return quat_to_matrix(p.q)
