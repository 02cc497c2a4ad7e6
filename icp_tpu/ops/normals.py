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


def _morton_order(p: jnp.ndarray) -> jnp.ndarray:
    """(m,) permutation sorting points by 3-D Morton (z-order) code.

    10 bits per axis over the cloud's bounding box; the classic
    bit-spreading ladder, all int32 VPU work + one sort.
    """
    lo = jnp.min(p, axis=0)
    hi = jnp.max(p, axis=0)
    q = jnp.clip((p - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0,
                 0.0, 1023.0).astype(jnp.int32)

    def spread(x):
        x = (x | (x << 16)) & 0x030000FF
        x = (x | (x << 8)) & 0x0300F00F
        x = (x | (x << 4)) & 0x030C30C3
        x = (x | (x << 2)) & 0x09249249
        return x

    key = (spread(q[:, 0]) | (spread(q[:, 1]) << 1)
           | (spread(q[:, 2]) << 2))
    return jnp.argsort(key).astype(jnp.int32)


def _smallest_eigvec3(C: jnp.ndarray) -> jnp.ndarray:
    """Closed-form smallest-eigenvalue eigenvector of symmetric 3x3 batches.

    Eberly's trigonometric eigenvalue form + cross-product null-space
    extraction — pure elementwise VPU work, no QR iterations: the batched
    ``eigh`` this replaces is the only part of kNN normal estimation that
    does not map to matmuls, and at LiDAR scale (262k neighborhoods) it
    dominates. Ill-conditioned cases (isotropic scatter, where the normal
    is meaningless anyway) fall back to +z.

    Args:
      C: (..., 3, 3) symmetric positive-semidefinite matrices.
    Returns:
      (..., 3) unit eigenvectors of the smallest eigenvalue.
    """
    a00, a01, a02 = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    a11, a12, a22 = C[..., 1, 1], C[..., 1, 2], C[..., 2, 2]
    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (b00 * b00 + b11 * b11 + b22 * b22
          + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 1e-30))
    # det(B/p) / 2 with B = C - q I.
    detb = (b00 * (b11 * b22 - a12 * a12)
            - a01 * (a01 * b22 - a12 * a02)
            + a02 * (a01 * a12 - b11 * a02))
    r = jnp.clip(detb / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # Eigenvalues: q + 2p cos(phi + {0, 2pi/3, 4pi/3}); the smallest is
    # the 2pi/3 branch.
    lam = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)

    # Null space of M = C - lam I: any two independent rows' cross product.
    m00, m11, m22 = a00 - lam, a11 - lam, a22 - lam
    r0 = jnp.stack([m00, a01, a02], -1)
    r1 = jnp.stack([a01, m11, a12], -1)
    r2 = jnp.stack([a02, a12, m22], -1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    n01 = jnp.sum(c01 * c01, -1)
    n02 = jnp.sum(c02 * c02, -1)
    n12 = jnp.sum(c12 * c12, -1)
    best = jnp.where((n01 >= n02)[..., None] & (n01 >= n12)[..., None], c01,
                     jnp.where((n02 >= n12)[..., None], c02, c12))
    norm2 = jnp.sum(best * best, -1, keepdims=True)
    # Isotropic / degenerate scatter: all cross products vanish — fall back
    # to +z (callers orient and the normal carries no information anyway).
    fallback = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 1.0], C.dtype), best.shape)
    ok = norm2 > 1e-20
    best = jnp.where(ok, best, fallback)
    return best / jnp.sqrt(jnp.where(ok, norm2, 1.0))


@functools.partial(jax.jit,
                   static_argnames=("k", "n_r", "multi_assign", "chunk"))
def knn_normals_rbc(points8: jnp.ndarray, k: int = 16, n_r: int = 0,
                    multi_assign: int = 2, chunk: int = 128) -> jnp.ndarray:
    """RBC-accelerated PCA normals for LARGE unorganized clouds.

    :func:`knn_normals` is O(m^2): blocked (block, m) distance matmuls put
    a hard scale cap on the "LiDAR sweep" claim (~57 ms/frame at 128k
    points). This estimator reuses the repo's Random-Ball-Cover idiom
    (rbc/construct.py — the same structure the reference pulls in
    precisely to kill O(n^2) search, reference external/RandomBallCover,
    SURVEY.md §2.5) on the GEOMETRIC-only metric:

      1. representatives = strided sample; each point's top-``multi_assign``
         nearest reps via chunked (block, n_r) MXU matmuls (the full
         (m, n_r) score matrix never materializes);
      2. database side: every point enters the bins of its ``multi_assign``
         nearest reps — overlapping balls, so a query's own bin contains
         its boundary-crossing neighbors (the classic RBC one-bin recall
         fix, on the DB side where it costs capacity, not query latency);
      3. queries group by their single nearest rep (rbc.grouping — one
         sort, no scatters);
      4. per bin: (cq, cb) distances, the k-th smallest distance per query
         via ``top_k`` VALUES (no index gathers), then the kNN covariance
         as two masked MXU matmuls — C = W b b^T - (W b)(W b)^T / k with
         W the 0/1 "within k-th distance" matrix. No neighbor gather ever
         happens;
      5. smallest-eigenvector normals in closed form
         (:func:`_smallest_eigvec3`), oriented toward the sensor.

    Exactness: kNN is exact for neighbors inside the union of the query's
    ``multi_assign`` nearest balls; tests hold the result to the same
    analytic-surface bounds as the brute estimator (objective-level
    equivalence — normal flips and far-tail neighbor swaps do not move
    the PLANE/GICP solution).

    Args:
      points8: (m, 8) cloud; zero-geometry points get zero normals and are
        excluded from every neighborhood (database side masked).
      k: neighborhood size.
      n_r: representative count (0 = auto: ~m/128 mean occupancy, power of
        two, >= 64).
      multi_assign: database-side bin multiplicity (2 covers ball
        boundaries; 1 = pure single-ball RBC).
      chunk: bins per ``lax.map`` step of the per-bin pass (bounds the
        (chunk, cq, cb) score tensor's footprint).
    """
    from icp_tpu.rbc.grouping import group_rows_by_bin

    p = points8[..., :3]
    m = p.shape[0]
    if n_r == 0:
        n_r = max(64, 1 << max(0, (m // 128 - 1).bit_length()))
    n_r = min(n_r, m)
    valid = jnp.sum(jnp.abs(p), axis=-1) > 0
    validf = valid.astype(p.dtype)

    # 1. Representatives: spatially STRATIFIED sample — a strided walk of
    # the Morton (z-order) sort, i.e. approximately equal-mass cells. An
    # index-strided sample (the organized pipeline's getReps idiom) is a
    # RANDOM sample on an unorganized cloud, and random Voronoi cells are
    # heavily skewed: measured query-bin overflow 8-10% at 1.5x mean
    # capacity vs 0.06-0.15% at 2x with stratified reps (same clouds).
    stride = m // n_r
    rep_idx = _morton_order(p)[stride // 2:: stride][:n_r]
    reps = p[rep_idx]
    hi = jax.lax.Precision.HIGHEST
    sq_r = jnp.sum(reps * reps, axis=-1)

    # Top-`multi_assign` nearest reps per point, in query strips.
    block = max(512, min(8192, m))
    padq = (-m) % block
    p_q = jnp.concatenate([p, jnp.zeros((padq, 3), p.dtype)]) if padq else p

    def strip(q):
        d = (jnp.sum(q * q, -1)[:, None]
             - 2.0 * jnp.dot(q, reps.T, precision=hi) + sq_r[None, :])
        _, idx = jax.lax.top_k(-d, multi_assign)
        return idx.astype(jnp.int32)

    rep_ids = jax.lax.map(strip, p_q.reshape(-1, block, 3))
    rep_ids = rep_ids.reshape(-1, multi_assign)[:m]  # (m, a)

    mean_occ = m // n_r
    # 2. Database bins: multi-assigned, capacity 2x the multi-assigned mean.
    cb = max(((2 * multi_assign * mean_occ + 127) // 128) * 128, 128)
    db_ids = rep_ids.T.reshape(-1)  # (a*m,) — column-major: all 1st choices
    db_rows = jnp.concatenate([p, validf[:, None]], axis=1)
    db_rows = jnp.tile(db_rows, (multi_assign, 1))
    # Invalid points: bin id n_r sorts past every real bin — searchsorted
    # counts for bins 0..n_r-1 are unaffected except the LAST bin, whose
    # count would swallow the tail; mask via the validity payload instead
    # (slots of invalid points keep validf = 0 and drop out of W below).
    dbg = group_rows_by_bin(db_ids, n_r, cb, (db_rows,))
    bins = dbg.grouped[0][..., :3]                      # (n_r, cb, 3)
    bvalid = dbg.valid & (dbg.grouped[0][..., 3] > 0.5)  # slot & point valid

    # 3. Queries: grouped by FIRST choice; ids ride as a float payload
    # (exact to 2^24 — 16.7M points, far beyond any single sweep).
    # 2x mean capacity: ~0.1% overflow with stratified reps (see above);
    # overflowed queries get zero normals (= no plane constraint).
    cq = max(((2 * mean_occ + 7) // 8) * 8, 16)
    q_rows = jnp.concatenate(
        [p, jnp.arange(m, dtype=p.dtype)[:, None], validf[:, None]], axis=1)
    qg = group_rows_by_bin(rep_ids[:, 0], n_r, cq, (q_rows,))
    qp = qg.grouped[0][..., :3]                       # (n_r, cq, 3)
    qid = qg.grouped[0][..., 3].astype(jnp.int32)
    qvalid = qg.valid & (qg.grouped[0][..., 4] > 0.5)

    sq_b = jnp.where(bvalid, jnp.sum(bins * bins, -1), jnp.inf)
    b9 = (bins[..., :, None] * bins[..., None, :]).reshape(n_r, -1, 9)

    n_chunks = max(n_r // chunk, 1)
    csz = n_r // n_chunks

    def bin_chunk(args):
        qpc, bc, sqbc, b9c = args  # (csz, cq|cb, ...)
        d2 = (jnp.sum(qpc * qpc, -1)[..., None]
              - 2.0 * jnp.einsum("bqd,bcd->bqc", qpc, bc, precision=hi)
              + sqbc[:, None, :])
        # k-th smallest distance per query (values only, no index gather).
        kth = -jax.lax.top_k(-d2, k)[0][..., -1:]
        # isfinite guard: with < k valid candidates kth is +inf, and
        # inf <= inf would admit garbage padding slots into W.
        W = ((d2 <= kth) & jnp.isfinite(d2)).astype(qpc.dtype)
        cnt = jnp.maximum(jnp.sum(W, -1, keepdims=True), 1.0)
        S1 = jnp.einsum("bqc,bcd->bqd", W, bc, precision=hi)
        M2 = jnp.einsum("bqc,bcn->bqn", W, b9c,
                        precision=hi).reshape(*W.shape[:2], 3, 3)
        C = M2 - (S1[..., :, None] * S1[..., None, :]) / cnt[..., None]
        n = _smallest_eigvec3(C)
        # Orient toward the sensor origin: n . p < 0.
        return n * jnp.where(
            jnp.sum(n * qpc, -1, keepdims=True) > 0, -1.0, 1.0)

    nrm = jax.lax.map(bin_chunk,
                      (qp.reshape(n_chunks, csz, cq, 3),
                       bins.reshape(n_chunks, csz, -1, 3),
                       sq_b.reshape(n_chunks, csz, -1),
                       b9.reshape(n_chunks, csz, -1, 9)))
    nrm = nrm.reshape(n_r, cq, 3)

    # 5. Scatter back to original order; invalid/overflow slots drop.
    out = jnp.zeros((m, 3), p.dtype)
    tgt = jnp.where(qvalid, qid, m)  # out-of-range -> dropped
    out = out.at[tgt.reshape(-1)].set(nrm.reshape(-1, 3), mode="drop")
    return jnp.where(valid[:, None], out, 0.0)


def normals_for(points8: jnp.ndarray, mode: str = "auto") -> jnp.ndarray:
    """Dispatch normal estimation (``ICPConfig.normal_mode``).

    "grid": organized row-major square grid (central differences).
    "knn": PCA of geometric k-NN (unorganized clouds). Exact brute-force
      up to 16384 points; beyond that it automatically routes to the
      RBC-accelerated estimator (the O(m^2) brute matmuls are the scale
      cap on LiDAR sweeps — ~57 ms/frame at 128k).
    "knn_rbc": force the RBC-accelerated estimator at any size.
    "auto": square point counts >= 8x8 are assumed organized (the
      reference's landmark sets always are) and get grid normals; other
      sizes get zeros (callers treat zero normals as 'no plane
      constraint'). Pass "knn" explicitly for unorganized clouds — auto
      CANNOT detect organization and a random square-sized cloud would
      get meaningless grid normals.
    """
    m = points8.shape[0]
    if mode == "knn_rbc" or (mode == "knn" and m > 16384):
        return knn_normals_rbc(points8)
    if mode == "knn":
        return knn_normals(points8)
    side = int(m ** 0.5)
    if side * side == m and side >= 8:
        return grid_normals(points8, side)
    if mode == "grid":
        raise ValueError(f"normal_mode='grid' needs a square point count, "
                         f"got m={m}")
    return jnp.zeros((m, 3), points8.dtype)
