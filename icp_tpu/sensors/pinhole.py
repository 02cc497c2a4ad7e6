"""Kinect pinhole camera model and 8-D cloud construction.

Mirrors the back-projection in the reference's frame grabber
(src/kinect_frame_grabber.cpp:246-264): for pixel (u, v) with depth d (mm),

    x = (u - 319.5) * d / 595
    y = (v - 239.5) * d / 595
    z = d
    rgb -> [0, 1] (rgb / 255 for 8-bit input)

packed as 8-D points [x, y, z, 1, r, g, b, 1].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FOCAL = 595.0
CX = 319.5
CY = 239.5
WIDTH = 640
HEIGHT = 480


@jax.jit
def backproject(depth: jnp.ndarray, rgb: jnp.ndarray,
                fx: float = FOCAL, fy: float = FOCAL,
                cx: float = CX, cy: float = CY) -> jnp.ndarray:
    """Depth + color images -> (H, W, 8) point cloud.

    Args:
      depth: (H, W) depth in millimeters (0 = invalid).
      rgb: (H, W, 3) color in [0, 1].
      fx, fy, cx, cy: intrinsics (default: the reference's Kinect model,
        f = 595, centered; TUM sequences pass their own).
    Returns:
      (H, W, 8) cloud; invalid pixels give all-zero geometry like the
      reference (zero depth -> zero x, y, z; downstream weighting handles
      them, reference kernels/icp_kernels.cl:50-51).
    """
    h, w = depth.shape
    u = jnp.arange(w, dtype=depth.dtype)[None, :]
    v = jnp.arange(h, dtype=depth.dtype)[None, :].T
    x = (u - cx) * depth / fx
    y = (v - cy) * depth / fy
    ones = jnp.ones_like(depth)
    return jnp.stack(
        [x, y, depth, ones, rgb[..., 0], rgb[..., 1], rgb[..., 2], ones],
        axis=-1,
    )


def project(points8: jnp.ndarray):
    """(n, 8) cloud -> pixel coordinates + depth (inverse of backproject)."""
    x, y, z = points8[..., 0], points8[..., 1], points8[..., 2]
    safe_z = jnp.where(z > 0, z, 1.0)
    u = x * FOCAL / safe_z + CX
    v = y * FOCAL / safe_z + CY
    return u, v, z
