"""Surface normal estimation.

Two estimators feed the point-to-plane / GICP objectives (accuracy
extensions over the reference, which is point-to-point only):

* :func:`grid_normals` — organized landmark grids (the 16384-landmark set
  is a 128x128 sample of the organized Kinect image,
  ops.sampling.get_landmarks): central differences of grid neighbors,
  O(m) elementwise work, no neighborhood search.
* :func:`knn_normals` — UNORGANIZED clouds (LiDAR sweeps, merged maps):
  PCA of each point's geometric k-nearest neighbors. TPU shape: blocked
  (block, m) distance matmuls + ``top_k`` + one batched 3x3 ``eigh``;
  runs once per frame at index-build time, not per iteration.

``normals_for`` dispatches between them (``ICPConfig.normal_mode``).
"""

from __future__ import annotations

import functools

import jax
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


@functools.partial(jax.jit, static_argnames=("k", "block"))
def knn_normals(points8: jnp.ndarray, k: int = 16,
                block: int = 2048) -> jnp.ndarray:
    """PCA normals from geometric k-nearest neighbors (unorganized clouds).

    Per point: gather its k geometric NNs (self included — it is its own
    zero-distance neighbor and contributes nothing to the scatter), take
    the smallest-eigenvalue eigenvector of the neighborhood covariance,
    orient toward the sensor origin (n . p < 0).

    TPU shape: the m x m distance matrix never materializes — queries go
    through in (block, m) strips (``lax.map``), each one MXU matmul +
    ``top_k``; the eigensolve is one batched (m, 3, 3) ``eigh``.

    Args:
      points8: (m, 8) cloud; invalid (zero-geometry) points get zero
        normals and are excluded from every neighborhood.
      k: neighborhood size.
      block: queries per strip (must divide m, or m is padded up).
    """
    p = points8[..., :3]
    m = p.shape[0]
    valid = jnp.sum(jnp.abs(p), axis=-1) > 0
    sq = jnp.sum(p * p, axis=-1)
    hi = jax.lax.Precision.HIGHEST

    pad = (-m) % block
    p_q = jnp.concatenate([p, jnp.zeros((pad, 3), p.dtype)]) if pad else p

    def strip(q):  # (block, 3) -> (block, k) neighbor ids
        d = (jnp.sum(q * q, axis=-1)[:, None]
             - 2.0 * jnp.dot(q, p.T, precision=hi) + sq[None, :])
        d = jnp.where(valid[None, :], d, jnp.inf)
        _, idx = jax.lax.top_k(-d, k)
        return idx

    idx = jax.lax.map(strip, p_q.reshape(-1, block, 3)).reshape(-1, k)[:m]
    nb = p[idx]  # (m, k, 3)
    # Invalid neighbors (all-invalid cloud edge case) collapse to p[0]'s
    # coordinates via top_k of all-inf rows — masked by the validity gate
    # on the OUTPUT below; the covariance itself is always well-formed.
    mu = jnp.mean(nb, axis=1, keepdims=True)
    dev = nb - mu
    C = jnp.einsum("mki,mkj->mij", dev, dev, precision=hi)
    _, vecs = jnp.linalg.eigh(C)  # ascending eigenvalues
    n = vecs[..., 0]  # smallest-scatter direction = surface normal
    # Orient toward the sensor origin (surfaces face the camera): n.p < 0.
    n = n * jnp.where(jnp.sum(n * p, axis=-1, keepdims=True) > 0, -1.0, 1.0)
    return jnp.where(valid[:, None], n, 0.0)


def normals_for(points8: jnp.ndarray, mode: str = "auto") -> jnp.ndarray:
    """Dispatch normal estimation (``ICPConfig.normal_mode``).

    "grid": organized row-major square grid (central differences).
    "knn": PCA of geometric k-NN (unorganized clouds).
    "auto": square point counts >= 8x8 are assumed organized (the
      reference's landmark sets always are) and get grid normals; other
      sizes get zeros (callers treat zero normals as 'no plane
      constraint'). Pass "knn" explicitly for unorganized clouds — auto
      CANNOT detect organization and a random square-sized cloud would
      get meaningless grid normals.
    """
    m = points8.shape[0]
    if mode == "knn":
        return knn_normals(points8)
    side = int(m ** 0.5)
    if side * side == m and side >= 8:
        return grid_normals(points8, side)
    if mode == "grid":
        raise ValueError(f"normal_mode='grid' needs a square point count, "
                         f"got m={m}")
    return jnp.zeros((m, 3), points8.dtype)
