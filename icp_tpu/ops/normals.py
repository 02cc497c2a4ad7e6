"""Surface normal estimation on organized landmark grids.

The 16384-landmark set is a 128x128 grid sampled from the organized Kinect
image (ops.sampling.get_landmarks), so normals come from central differences
of grid neighbors — O(m) elementwise work, no neighborhood search. Used by
the point-to-plane objective (an accuracy extension over the reference,
which is point-to-point only: point-to-plane removes the tangential
discretization bias of matching against a ~15 mm-pitch sample lattice).
"""

from __future__ import annotations

import jax.numpy as jnp

from icp_tpu.ops.sampling import LM_GRID


def grid_normals(landmarks8: jnp.ndarray, grid: int = LM_GRID) -> jnp.ndarray:
    """Per-landmark unit normals from the organized grid.

    Args:
      landmarks8: (grid*grid, 8) landmarks in row-major grid order.
    Returns:
      (grid*grid, 3) unit normals, oriented toward the camera (-z
      half-space, since Kinect clouds look down +z); zero where the
      neighborhood is invalid (any zero-geometry neighbor).
    """
    pts = landmarks8.reshape(grid, grid, 8)[..., :3]

    # Central differences with edge clamping.
    du = jnp.gradient(pts, axis=1)
    dv = jnp.gradient(pts, axis=0)
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.where(norm > 1e-12, norm, 1.0)

    # Orient toward the camera: normal.z < 0 (surface faces the origin).
    n = n * jnp.where(n[..., 2:3] > 0, -1.0, 1.0)

    # Invalidate where the point or any 4-neighbor has zero geometry.
    # Edge-padded shifts (NOT roll — wraparound would invalidate one image
    # border based on the opposite border's holes).
    valid = jnp.abs(pts).sum(-1) > 0
    vp = jnp.pad(valid, 1, mode="edge")
    v = (valid
         & vp[:-2, 1:-1] & vp[2:, 1:-1]
         & vp[1:-1, :-2] & vp[1:-1, 2:])
    n = jnp.where(v[..., None], n, 0.0)
    return n.reshape(grid * grid, 3)


def normals_for(points8: jnp.ndarray) -> jnp.ndarray:
    """Dispatch: organized 128x128 landmark sets get grid normals; other
    sizes get a best-effort square-grid assumption when possible, else
    zeros (callers treat zero normals as 'no plane constraint')."""
    m = points8.shape[0]
    side = int(m ** 0.5)
    if side * side == m and side >= 8:
        return grid_normals(points8, side)
    return jnp.zeros((m, 3), points8.dtype)
