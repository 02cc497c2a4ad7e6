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

    Differentiable THROUGH zero rotation: everything is expressed in
    a2 = |phi|^2 with a Taylor branch guarded by the double-where trick —
    pose-graph/BA Jacobians are taken exactly at xi = 0, where a naive
    normalize-the-axis formulation has a zero/NaN derivative (jnp.where
    alone does not stop NaN gradients from the untaken branch).
    """
    rho, phi = xi[..., :3], xi[..., 3:]
    a2 = jnp.sum(phi * phi, axis=-1, keepdims=True)
    small = a2 < 1e-8
    safe_a2 = jnp.where(small, 1.0, a2)
    angle = jnp.sqrt(safe_a2)
    # sin(angle/2)/angle, Taylor: 1/2 - a2/48 + a2^2/3840
    s_closed = jnp.sin(0.5 * angle) / angle
    s_taylor = 0.5 - a2 / 48.0 + (a2 * a2) / 3840.0
    s = jnp.where(small, s_taylor, s_closed)
    # cos(angle/2), Taylor: 1 - a2/8 + a2^2/384
    c_closed = jnp.cos(0.5 * angle)
    c_taylor = 1.0 - a2 / 8.0 + (a2 * a2) / 384.0
    c = jnp.where(small, c_taylor, c_closed)
    q = jnp.concatenate([s * phi, c], axis=-1)
    return Pose(q, rho)


def log(p: Pose) -> jnp.ndarray:
    """Pose -> [rho, phi] (inverse of :func:`exp` to first order).

    Differentiable through the identity rotation (double-where guarded
    Taylor branch in n2 = |q_vec|^2)."""
    w = p.q[..., 3:4]
    vec = p.q[..., :3]
    n2 = jnp.sum(vec * vec, axis=-1, keepdims=True)
    small = n2 < 1e-8
    safe_n2 = jnp.where(small, 1.0, n2)
    norm = jnp.sqrt(safe_n2)
    # f = 2 * atan2(norm, w) / norm; Taylor (unit q, w ~ +-1):
    # f = 2/w - 2 n2 / (3 w^3)
    f_closed = 2.0 * jnp.arctan2(norm, w) / norm
    safe_w = jnp.where(jnp.abs(w) > 1e-6, w, 1.0)
    f_taylor = 2.0 / safe_w - 2.0 * n2 / (3.0 * safe_w**3)
    f = jnp.where(small, f_taylor, f_closed)
    return jnp.concatenate([p.t, vec * f], axis=-1)


def retract(p: Pose, xi: jnp.ndarray) -> Pose:
    """Left-multiplicative retraction: exp(xi) * p."""
    return compose(exp(xi), p)


def apply(p: Pose, points: jnp.ndarray) -> jnp.ndarray:
    """Transform (..., 3) points by the pose."""
    return qrotate(p.q, points) + p.t


def rotation_matrix(p: Pose) -> jnp.ndarray:
    return quat_to_matrix(p.q)
