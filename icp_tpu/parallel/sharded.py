"""Sharded ICP execution over a (dp, mp) device mesh.

No reference counterpart exists (the reference is strictly single-device);
this is the BASELINE.json extension: the moving/query axis is sharded over
``dp`` and the RBC representative/bin axis over ``mp``. Per iteration:

  * transform: local (embarrassingly parallel over dp).
  * phase-1 rep assignment: each mp shard scores its representative slice
    for the dp-local queries, then an ``all_gather`` over mp resolves the
    global nearest representative (an argmin-with-payload combine).
  * phase-2 bin search: each mp shard runs the grouped batched-matmul search
    over ITS bins for the dp-local queries assigned to them; remote-rep
    queries score +inf and the mp ``all_gather`` selects the winner.
  * reductions: weights / centroid partials / S-matrix partials are local
    sums followed by a single ``psum`` over BOTH axes (11 + 7 + 1 floats —
    the entire per-iteration collective payload).
  * rotation solve: replicated (identical tiny computation on every shard;
    cheaper than communicating it).

The whole iterate-to-convergence loop stays a ``lax.while_loop`` inside one
``shard_map``, so a multi-chip registration is still ONE dispatch.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from icp_tpu.icp.horn import solve_step_transform
from icp_tpu.icp.quaternion import qmul, qnormalize, qrotate, transform_points
from icp_tpu.icp.state import ICPState, identity_state
from icp_tpu.icp.run import converged
from icp_tpu.ops.distance import metric_weights, pairwise_sq_dists
from icp_tpu.ops.moments import (
    centroid_partials,
    compute_weights,
    deviations,
    s_matrix,
)
from icp_tpu.ops.sampling import sample_representative_indices
from icp_tpu.parallel.mesh import DP_AXIS, MP_AXIS
from icp_tpu.rbc.construct import RBCIndex, rbc_construct
from icp_tpu.rbc.grouping import group_rows_by_bin
from icp_tpu.runtime.config import (
    Correspondence,
    ICPConfig,
    ICPParams,
    Objective,
    RotationMode,
    Weighting,
)


def _slice_index_for_mp(index: RBCIndex, n_r_local: int) -> RBCIndex:
    """Slice the mp-local representative range out of a replicated index.

    Construction is replicated (it is one small matmul + sort); each mp shard
    then keeps only its slice of reps/bins. ``db`` stays replicated (the
    fixed landmark set is ~512 KB — far cheaper to copy than to shuffle
    matched points between shards every iteration).
    """
    mp_idx = jax.lax.axis_index(MP_AXIS)
    start = mp_idx * n_r_local

    def sl(x):
        return jax.lax.dynamic_slice_in_dim(x, start, n_r_local, axis=0)

    return RBCIndex(
        reps=sl(index.reps),
        rep_db_ids=sl(index.rep_db_ids),
        db=index.db,
        rep_id=index.rep_id,
        layout=index.layout,
        bins=sl(index.bins),
        bin_ids=sl(index.bin_ids),
        bin_mask=sl(index.bin_mask),
        bins_centered=sl(index.bins_centered),
        sq_b_masked=sl(index.sq_b_masked),
        alpha=index.alpha,
        normals=index.normals,
        bin_normals=sl(index.bin_normals),
    )


def _sharded_rbc_nn(index: RBCIndex, queries: jnp.ndarray, params: ICPParams,
                    config: ICPConfig, n_r_local: int, query_capacity: int):
    """mp-sharded RBC search for dp-local queries.

    Args:
      index: REPLICATED index (sliced internally per mp shard).
      queries: (m_local, 8) dp-local transformed queries.
    Returns:
      (matched_fixed (m_local, 8), nn_dist (m_local,)).
    """
    m_local = queries.shape[0]
    local = _slice_index_for_mp(index, n_r_local)
    mp_idx = jax.lax.axis_index(MP_AXIS)
    rep_offset = mp_idx * n_r_local

    # Phase 1: best local representative, then global combine over mp.
    d2_qr = pairwise_sq_dists(queries, local.reps, params.alpha)
    best_local = jnp.argmin(d2_qr, axis=1).astype(jnp.int32)
    d_local = jnp.min(d2_qr, axis=1)
    d_all = jax.lax.all_gather(d_local, MP_AXIS)  # (mp, m_local)
    r_all = jax.lax.all_gather(best_local + rep_offset, MP_AXIS)
    win = jnp.argmin(d_all, axis=0)
    query_rep = jnp.take_along_axis(r_all, win[None, :], axis=0)[0]  # global id
    d_to_rep = jnp.min(d_all, axis=0)

    # Phase 2: grouped in-bin search over the LOCAL bins. Queries owned by a
    # remote shard land in a parking bin (id n_r_local) that is ignored.
    local_rep = query_rep - rep_offset
    owned = (local_rep >= 0) & (local_rep < n_r_local)
    bin_of_query = jnp.where(owned, local_rep, n_r_local)
    # One payload sort groups the queries AND their local ids (exact in f32)
    # bin-major — no member table, no fancy gather (same trick as the
    # single-chip path; see rbc.grouping.group_rows_by_bin).
    ids_col = jnp.arange(m_local, dtype=queries.dtype)[:, None]
    qlayout = group_rows_by_bin(bin_of_query, n_r_local + 1, query_capacity,
                                (queries, ids_col))
    qrows, qids = qlayout.grouped

    qmember = qids[:n_r_local, :, 0].astype(jnp.int32)  # drop the parking bin
    qvalid = qlayout.valid[:n_r_local]
    qgroups = qrows[:n_r_local] - local.reps[:, None, :]

    w8 = metric_weights(params.alpha, queries.dtype)
    qg_w = qgroups * w8
    sq_q = jnp.sum(qg_w * qgroups, axis=-1)
    if config.use_pallas and jax.default_backend() == "tpu":
        # Same fused VMEM kernel as the single-chip path, on the local bin
        # slice; the winner's bin id rides in the payload (one extra lane).
        from icp_tpu.kernels.bin_search import bin_search_pallas

        vals = jnp.concatenate(
            [local.bins, local.bin_ids[..., None].astype(jnp.float32)],
            axis=-1)
        best_sc, matched_vals = bin_search_pallas(
            qg_w, local.bins_centered, local.sq_b_masked, vals)
        best_id = matched_vals[..., 8].astype(jnp.int32)
    else:
        cross = jnp.einsum("rqd,rcd->rqc", qg_w, local.bins_centered,
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
        score = local.sq_b_masked[:, None, :] - 2.0 * cross
        best_slot = jnp.argmin(score, axis=-1)
        best_sc = jnp.min(score, axis=-1)
        best_id = jnp.take_along_axis(local.bin_ids, best_slot, axis=-1)
    best_d2 = jnp.where(jnp.isfinite(best_sc),
                        jnp.maximum(best_sc + sq_q, 0.0), jnp.inf)

    # Scatter grouped results back to dp-local query order; +inf elsewhere.
    found = qvalid & jnp.isfinite(best_d2)
    scatter_to = jnp.where(qvalid, qmember, m_local)
    nn_d_local = jnp.full((m_local,), jnp.inf, queries.dtype).at[
        scatter_to.reshape(-1)
    ].set(jnp.where(found, best_d2, jnp.inf).reshape(-1), mode="drop")
    nn_id_local = jnp.zeros((m_local,), jnp.int32).at[
        scatter_to.reshape(-1)
    ].set(best_id.reshape(-1), mode="drop")

    # Fallback candidate: the owning rep's own database point.
    fb_id = jnp.where(owned, local.rep_db_ids[jnp.clip(local_rep, 0, n_r_local - 1)], 0)
    fb_d = jnp.where(owned & jnp.isinf(nn_d_local), d_to_rep, jnp.inf)
    use_fb = fb_d < nn_d_local
    nn_d_local = jnp.where(use_fb, fb_d, nn_d_local)
    nn_id_local = jnp.where(use_fb, fb_id, nn_id_local)

    # Final combine over mp: owner shard carries the real value, rest +inf.
    nd_all = jax.lax.all_gather(nn_d_local, MP_AXIS)  # (mp, m_local)
    ni_all = jax.lax.all_gather(nn_id_local, MP_AXIS)
    win2 = jnp.argmin(nd_all, axis=0)
    nn_dist = jnp.min(nd_all, axis=0)
    nn_id = jnp.take_along_axis(ni_all, win2[None, :], axis=0)[0]
    return index.db[nn_id], nn_dist, nn_id


def sharded_icp_step(state: ICPState, moving_local: jnp.ndarray,
                     index: RBCIndex, params: ICPParams, config: ICPConfig,
                     n_r_local: int, query_capacity: int,
                     mnormals_local: Optional[jnp.ndarray] = None) -> ICPState:
    """One ICP iteration with dp-sharded queries and mp-sharded bins.

    Call INSIDE shard_map over a (dp, mp) mesh.
    """
    tm = transform_points(moving_local, state.q, state.t, state.s)

    if config.correspondence is Correspondence.RBC:
        matched_f, nn_dist, nn_id = _sharded_rbc_nn(
            index, tm, params, config, n_r_local, query_capacity)
    else:
        d2 = pairwise_sq_dists(tm, index.db, params.alpha)
        nn_id = jnp.argmin(d2, axis=1)
        nn_dist = jnp.min(d2, axis=1)
        matched_f = index.db[nn_id]

    both = (DP_AXIS, MP_AXIS)
    mp_size = jax.lax.axis_size(MP_AXIS)
    # Invalid (zero-geometry) pair discard — same rule as the single-chip
    # step. Moving validity comes from the ORIGINAL local coordinates (a
    # transformed invalid point sits at t, not 0); results here are in
    # original dp-local order so no lane trick is needed.
    mask = jnp.logical_and(
        jnp.sum(jnp.abs(moving_local[..., :3]), axis=-1) > 0,
        jnp.sum(jnp.abs(matched_f[..., :3]), axis=-1) > 0,
    )
    if config.weighting is Weighting.WEIGHTED:
        w = compute_weights(nn_dist)
    else:
        w = None

    if config.objective is Objective.PLANE:
        # Point-to-plane: per-shard 6x6 partials, one psum, replicated solve.
        # (dp shards are disjoint; mp shards duplicate — divide after psum.)
        from icp_tpu.icp.plane import plane_system_partials, solve_plane_system

        H, b = plane_system_partials(tm[..., :3], matched_f[..., :3],
                                     index.normals[nn_id], w, mask)
        H = jax.lax.psum(H, both) / mp_size
        b = jax.lax.psum(b, both) / mp_size
        qk, tk = solve_plane_system(H, b)
        sk = jnp.ones((), tm.dtype)
    elif config.objective is Objective.GICP:
        # Plane-to-plane Mahalanobis partials; same psum contract as PLANE.
        # Moving normals are precomputed on the full grid (sharded over dp)
        # and rotated by the accumulated q each iteration.
        from icp_tpu.icp.gicp import gicp_system_partials
        from icp_tpu.icp.plane import solve_plane_system

        n_m = qrotate(state.q, mnormals_local)
        H, b = gicp_system_partials(tm[..., :3], matched_f[..., :3],
                                    index.normals[nn_id], n_m,
                                    params.gicp_epsilon, w, mask)
        H = jax.lax.psum(H, both) / mp_size
        b = jax.lax.psum(b, both) / mp_size
        qk, tk = solve_plane_system(H, b)
        sk = jnp.ones((), tm.dtype)
    else:
        sum_f, sum_m, denom = centroid_partials(matched_f, tm, w, mask)
        # NOTE: dp shards hold disjoint queries; mp shards all hold the same
        # queries, so partials must NOT be double counted over mp — divide
        # by the mp axis size after the psum (cheaper than a second
        # collective).
        sum_f = jax.lax.psum(sum_f, both) / mp_size
        sum_m = jax.lax.psum(sum_m, both) / mp_size
        denom = jax.lax.psum(denom, both) / mp_size
        mean_f = sum_f / denom
        mean_m = sum_m / denom

        dev_f = deviations(matched_f, mean_f)
        dev_m = deviations(tm, mean_m)
        S11 = s_matrix(dev_m, dev_f, params.c, w, mask)
        S11 = jax.lax.psum(S11, both) / mp_size

        qk, tk, sk = solve_step_transform(
            S11, mean_f, mean_m,
            mode=config.rotation.value,
            estimate_scale=config.estimate_scale)

    q = qnormalize(qmul(qk, state.q))
    t = sk * qrotate(qk, state.t) + tk
    s = sk * state.s
    return ICPState(q=q, t=t, s=s, qk=qk, tk=tk, sk=sk, k=state.k + 1)


def sharded_icp_run(moving_local, index, params, config,
                    n_r_local, query_capacity,
                    mnormals_local=None) -> ICPState:
    """Device-resident convergence loop (inside shard_map)."""
    state = identity_state(moving_local.dtype)

    def cond(s):
        return jnp.logical_and(
            s.k < config.max_iterations,
            jnp.logical_or(s.k == 0, jnp.logical_not(converged(s, params))),
        )

    def body(s):
        return sharded_icp_step(s, moving_local, index, params, config,
                                n_r_local, query_capacity,
                                mnormals_local=mnormals_local)

    return jax.lax.while_loop(cond, body, state)


def make_sharded_register(mesh, config: ICPConfig):
    """Build the jitted multi-chip registration entry point.

    Layout: fixed landmarks replicated, moving landmarks sharded over dp
    (replicated over mp). Returns ``fn(fixed8, moving8, params) -> ICPState``.
    """
    n_dp = mesh.shape[DP_AXIS]
    n_mp = mesh.shape[MP_AXIS]
    if config.n_r % n_mp != 0:
        raise ValueError("n_r must divide evenly over the mp axis")
    if config.m % n_dp != 0:
        raise ValueError("m must divide evenly over the dp axis")
    n_r_local = config.n_r // n_mp
    m_local = config.m // n_dp
    # Local query capacity: dp-local queries spread over the FULL rep range;
    # expected m_local / n_r per bin, padded 4x like the single-chip path.
    query_capacity = max(4 * m_local // config.n_r, 8)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P(DP_AXIS, None), P(DP_AXIS, None), P()),
             out_specs=P(),
             check_vma=False)
    def _run(fixed8, moving_local, mnormals_local, params):
        rep_ids = sample_representative_indices(
            fixed8.shape[0], config.n_r, config.rep_grid)
        if config.needs_normals:
            from icp_tpu.ops.normals import normals_for

            normals = normals_for(fixed8)
        else:
            normals = None
        index = rbc_construct(fixed8, fixed8[rep_ids], params.alpha,
                              config.bin_capacity, rep_db_ids=rep_ids,
                              normals=normals)
        return sharded_icp_run(moving_local, index, params, config,
                               n_r_local, query_capacity,
                               mnormals_local=mnormals_local)

    @jax.jit
    def run(fixed8, moving8, params):
        # Moving normals need the FULL organized grid, so they are computed
        # before the shard_map and row-sharded alongside the moving points
        # (GICP only; a cheap zero placeholder otherwise keeps one spec).
        if config.objective is Objective.GICP:
            from icp_tpu.ops.normals import normals_for

            mnormals = normals_for(moving8)
        else:
            mnormals = jnp.zeros((moving8.shape[0], 3), moving8.dtype)
        return _run(fixed8, moving8, mnormals, params)

    return run
