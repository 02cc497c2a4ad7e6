"""Quaternion / rigid-transform utilities.

Conventions follow the reference pipeline:

* Quaternion layout is ``[qx, qy, qz, qw]`` (vector part first, scalar last),
  matching the reference's T buffer ``[q; t|s]`` (Eigen ``coeffs()`` order,
  reference src/ICP/algorithms.cpp:3495-3498) and the
  ``icpTransform_Quaternion`` kernel (reference kernels/icp_kernels.cl:771-802).
* Rotation of a point by a unit quaternion uses the cross-product form
  ``p' = p + 2 v x (v x p + w p)`` (reference kernels/icp_kernels.cl:798).
* Similarity transforms are parameterized as ``p' = s * R(q) * p + t``.

All functions are jit-compatible and operate on float32 jnp arrays.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def qidentity(dtype=jnp.float32) -> jnp.ndarray:
    """Identity quaternion [0, 0, 0, 1]."""
    return jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype)


def qnormalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def qconj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def qmul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product q1 * q2 in [x, y, z, w] layout.

    Composition rule: ``R(q1 * q2) == R(q1) @ R(q2)``.
    """
    x1, y1, z1, w1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    x2, y2, z2, w2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def qrotate(q: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """Rotate point(s) ``p`` (..., 3) by unit quaternion ``q`` (4,).

    Uses the reference's cross-product form
    ``p' = p + 2 v x (v x p + w p)`` (kernels/icp_kernels.cl:798).
    """
    v = q[..., :3]
    w = q[..., 3:4]
    inner = jnp.cross(v, p) + w * p
    return p + 2.0 * jnp.cross(v, inner)


def qangle_deg(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation angle of a unit quaternion, in degrees.

    Mirrors the reference convergence metric
    ``180/pi * 2 * atan2(|q_vec|, q_w)`` (src/ICP/algorithms.cpp:4826).
    """
    vec_norm = jnp.linalg.norm(q[..., :3], axis=-1)
    return jnp.degrees(2.0 * jnp.arctan2(vec_norm, q[..., 3]))


def qaxis(q: jnp.ndarray) -> jnp.ndarray:
    """Rotation axis of a unit quaternion (unit vector; arbitrary at 0 angle)."""
    v = q[..., :3]
    n = jnp.linalg.norm(v, axis=-1, keepdims=True)
    return v / jnp.where(n > 0, n, 1.0)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [x, y, z, w] -> 3x3 rotation matrix."""
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)], -1),
            jnp.stack([2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)], -1),
            jnp.stack([2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )


def matrix_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """3x3 rotation matrix -> unit quaternion [x, y, z, w].

    Branchless Shepperd's method: compute all four candidate solutions and
    select the best-conditioned one with ``where`` (jit has no data-dependent
    branches). Sign convention makes w >= 0.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates, each scaled by 4*component^2 (always >= 0).
    qw2 = jnp.maximum(1.0 + tr, 0.0)
    qx2 = jnp.maximum(1.0 + m00 - m11 - m22, 0.0)
    qy2 = jnp.maximum(1.0 - m00 + m11 - m22, 0.0)
    qz2 = jnp.maximum(1.0 - m00 - m11 + m22, 0.0)

    # Candidate built from w (valid when qw2 is largest):
    sw = jnp.sqrt(qw2 + 1e-30)
    cand_w = jnp.stack([(m21 - m12) / (2 * sw), (m02 - m20) / (2 * sw),
                        (m10 - m01) / (2 * sw), sw / 2], -1)
    sx = jnp.sqrt(qx2 + 1e-30)
    cand_x = jnp.stack([sx / 2, (m01 + m10) / (2 * sx),
                        (m02 + m20) / (2 * sx), (m21 - m12) / (2 * sx)], -1)
    sy = jnp.sqrt(qy2 + 1e-30)
    cand_y = jnp.stack([(m01 + m10) / (2 * sy), sy / 2,
                        (m12 + m21) / (2 * sy), (m02 - m20) / (2 * sy)], -1)
    sz = jnp.sqrt(qz2 + 1e-30)
    cand_z = jnp.stack([(m02 + m20) / (2 * sz), (m12 + m21) / (2 * sz),
                        sz / 2, (m10 - m01) / (2 * sz)], -1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], -1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], -2)
    q = jnp.take_along_axis(cands, best[..., None, None].astype(jnp.int32), axis=-2)
    q = jnp.squeeze(q, axis=-2)
    q = qnormalize(q)
    # Canonical sign: w >= 0.
    return q * jnp.where(q[..., 3:4] < 0, -1.0, 1.0)


def transform_points(points8: jnp.ndarray, q: jnp.ndarray, t: jnp.ndarray,
                     s: jnp.ndarray) -> jnp.ndarray:
    """Apply ``p' = s * R(q) * p + t`` to the geometric half of 8-D points.

    The photometric half (columns 4:8) passes through untouched, exactly like
    ``icpTransform_Quaternion`` where only half the work-items transform and
    the other half copy the photometric float4
    (reference kernels/icp_kernels.cl:771-802).

    Args:
      points8: (n, 8) array [x, y, z, 1, r, g, b, 1].
      q: (4,) unit quaternion [x, y, z, w].
      t: (3,) translation.
      s: scalar scale.
    Returns:
      (n, 8) transformed array.
    """
    xyz = points8[..., :3]
    new_xyz = s * qrotate(q, xyz) + t
    return jnp.concatenate(
        [new_xyz, points8[..., 3:4], points8[..., 4:]], axis=-1
    )


def transform_points_matrix(points8: jnp.ndarray, T: jnp.ndarray) -> jnp.ndarray:
    """Apply a row-major 4x4 homogeneous transform (sR folded into R) to the
    geometric half of 8-D points; photometric half passes through.

    Mirrors ``icpTransform_Matrix`` (reference kernels/icp_kernels.cl:903-933):
    only x, y, z are rewritten; the homogeneous w keeps its input value.
    """
    geo = points8[..., :4]
    new_xyz = jnp.dot(geo, T[:3, :].T, precision=jax.lax.Precision.HIGHEST)
    return jnp.concatenate([new_xyz, points8[..., 3:4], points8[..., 4:]], axis=-1)


def similarity_to_matrix(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Build a 4x4 homogeneous matrix T = [[s*R, t], [0, 1]]."""
    R = quat_to_matrix(q)
    top = jnp.concatenate([s * R, t[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=top.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def pack_T(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Pack the reference T-buffer layout [qx,qy,qz,qw, tx,ty,tz,s] (8,)."""
    return jnp.concatenate([q, t, jnp.reshape(s, (1,))])


def unpack_T(T8: jnp.ndarray):
    """Inverse of :func:`pack_T` -> (q, t, s)."""
    return T8[:4], T8[4:7], T8[7]
