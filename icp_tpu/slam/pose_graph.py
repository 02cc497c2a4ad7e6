"""Pose-graph optimization (Gauss-Newton on SE(3)).

No reference counterpart — this is the keyframe/pose-graph backend of the
BASELINE.json extension (configs 4-5). Graph: nodes = keyframe poses,
edges = relative-pose measurements (odometry chain + loop closures, both
produced by the ICP engine). Residual per edge (i, j) with measurement
Z (= measured pose_i^-1 * pose_j):

    r_ij = log( Z^-1 * X_i^-1 * X_j )   in R^6  ([rho, phi])

Gauss-Newton with analytic-free Jacobians via ``jax.jacfwd`` over the
per-edge residual (6x6 blocks; tiny), assembled into a dense 6N x 6N normal
system. Dense is right-sized here: pose graphs from room-scale RGB-D runs
are 10^1-10^3 nodes; a 6N x 6N solve on the MXU is microseconds at that
scale, and XLA fuses the whole iteration into one dispatch. The distributed
Schur-complement path for large maps lives in
icp_tpu.slam.bundle_adjustment.

Edges are stored as arrays (struct-of-arrays) so the whole optimizer jits
with static node/edge counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from icp_tpu.slam import se3


class PoseGraph(NamedTuple):
    """Struct-of-arrays pose graph.

    Attributes:
      q: (N, 4) node orientations.
      t: (N, 3) node positions.
      edge_i: (E,) source node index.
      edge_j: (E,) target node index.
      meas_q: (E, 4) measured relative orientation (i_from_j convention:
        Z = X_i^-1 X_j).
      meas_t: (E, 3) measured relative translation.
      weight: (E,) scalar information weight per edge (e.g. ICP iteration
        count / residual based).
    """

    q: jnp.ndarray
    t: jnp.ndarray
    edge_i: jnp.ndarray
    edge_j: jnp.ndarray
    meas_q: jnp.ndarray
    meas_t: jnp.ndarray
    weight: jnp.ndarray


def graph_from_poses(poses_q, poses_t, edges, meas, weights=None) -> PoseGraph:
    """Build a PoseGraph from lists/arrays (host-side convenience)."""
    import numpy as np

    edge_i = jnp.asarray(np.asarray([e[0] for e in edges], np.int32))
    edge_j = jnp.asarray(np.asarray([e[1] for e in edges], np.int32))
    meas_q = jnp.stack([m.q for m in meas])
    meas_t = jnp.stack([m.t for m in meas])
    w = (jnp.ones((len(edges),), jnp.float32) if weights is None
         else jnp.asarray(weights))
    return PoseGraph(jnp.stack(list(poses_q)), jnp.stack(list(poses_t)),
                     edge_i, edge_j, meas_q, meas_t, w)


def edge_residual(xi_i, xi_j, pose_i: se3.Pose, pose_j: se3.Pose,
                  meas: se3.Pose) -> jnp.ndarray:
    """Residual of one edge, parameterized by local updates xi around the
    current linearization points (left-multiplicative retraction)."""
    Xi = se3.retract(pose_i, xi_i)
    Xj = se3.retract(pose_j, xi_j)
    return se3.log(se3.compose(se3.inverse(meas),
                               se3.compose(se3.inverse(Xi), Xj)))


def _edge_jacobians(pose_i: se3.Pose, pose_j: se3.Pose, meas: se3.Pose):
    """(r0 (6,), Ji (6, 6), Jj (6, 6)) at xi = 0 via forward-mode autodiff."""
    zero = jnp.zeros((6,), pose_i.t.dtype)
    r0 = edge_residual(zero, zero, pose_i, pose_j, meas)
    Ji = jax.jacfwd(lambda xi: edge_residual(xi, zero, pose_i, pose_j, meas))(zero)
    Jj = jax.jacfwd(lambda xj: edge_residual(zero, xj, pose_i, pose_j, meas))(zero)
    return r0, Ji, Jj


def _assemble_system(graph: PoseGraph, q, t, n: int):
    """Shared GN normal-system assembly: (H (n,6,n,6), b (n,6), cost).

    Used by both the single-device and edge-sharded optimizers (the latter
    psums H/b afterward)."""
    poses_i = se3.Pose(q[graph.edge_i], t[graph.edge_i])
    poses_j = se3.Pose(q[graph.edge_j], t[graph.edge_j])
    meas = se3.Pose(graph.meas_q, graph.meas_t)

    r0, Ji, Jj = jax.vmap(_edge_jacobians)(poses_i, poses_j, meas)
    w = graph.weight[:, None, None]

    hi = jax.lax.Precision.HIGHEST
    Hii = jnp.matmul(jnp.swapaxes(Ji, 1, 2), Ji * w, precision=hi)
    Hjj = jnp.matmul(jnp.swapaxes(Jj, 1, 2), Jj * w, precision=hi)
    Hij = jnp.matmul(jnp.swapaxes(Ji, 1, 2), Jj * w, precision=hi)
    bi = jnp.einsum("ekr,ek->er", Ji * w[..., 0:1], r0, precision=hi)
    bj = jnp.einsum("ekr,ek->er", Jj * w[..., 0:1], r0, precision=hi)

    H = jnp.zeros((n, 6, n, 6), q.dtype)
    H = H.at[graph.edge_i, :, graph.edge_i, :].add(Hii)
    H = H.at[graph.edge_j, :, graph.edge_j, :].add(Hjj)
    H = H.at[graph.edge_i, :, graph.edge_j, :].add(Hij)
    H = H.at[graph.edge_j, :, graph.edge_i, :].add(jnp.swapaxes(Hij, 1, 2))
    b = jnp.zeros((n, 6), q.dtype)
    b = b.at[graph.edge_i].add(bi)
    b = b.at[graph.edge_j].add(bj)
    cost = jnp.sum(r0 * r0 * graph.weight[:, None])
    return H, b, cost


def _solve_and_retract(H, b, q, t, n: int, damping: float, fix_first: bool):
    """Dense gauge-anchored solve + pose update (shared)."""
    Hf = H.reshape(6 * n, 6 * n)
    bf = b.reshape(6 * n)
    if fix_first:
        anchor = jnp.zeros((6 * n,), q.dtype).at[:6].set(1e12)
        Hf = Hf + jnp.diag(anchor)
    Hf = Hf + damping * jnp.eye(6 * n, dtype=q.dtype)
    dx = -jnp.linalg.solve(Hf, bf).reshape(n, 6)
    new = jax.vmap(lambda qq, tt, xi: se3.retract(se3.Pose(qq, tt), xi))(
        q, t, dx)
    return new.q, new.t


@partial(jax.jit, static_argnames=("iterations", "fix_first"))
def optimize(graph: PoseGraph, iterations: int = 10,
             damping: float = 1e-6, fix_first: bool = True) -> PoseGraph:
    """Gauss-Newton (Levenberg-damped) pose-graph optimization.

    The first node is gauge-fixed (anchored) by default. Builds the dense
    6N x 6N normal system with vmapped 6x6 blocks scattered via
    segment-sum-style index_add, solves with Cholesky-backed ``solve``.
    """
    n = graph.q.shape[0]

    def gn_iter(carry, _):
        q, t = carry
        H, b, cost = _assemble_system(graph, q, t, n)
        q, t = _solve_and_retract(H, b, q, t, n, damping, fix_first)
        return (q, t), cost

    (q, t), costs = jax.lax.scan(gn_iter, (graph.q, graph.t), None,
                                 length=iterations)
    return graph._replace(q=q, t=t)


def _edge_partials(graph: PoseGraph, q, t):
    """Per-edge linearization (r0, Ji, Jj) and the gradient b = J^T W r
    scattered to nodes — shared by the PCG path."""
    poses_i = se3.Pose(q[graph.edge_i], t[graph.edge_i])
    poses_j = se3.Pose(q[graph.edge_j], t[graph.edge_j])
    meas = se3.Pose(graph.meas_q, graph.meas_t)
    r0, Ji, Jj = jax.vmap(_edge_jacobians)(poses_i, poses_j, meas)
    hi = jax.lax.Precision.HIGHEST
    wr = r0 * graph.weight[:, None]
    n = q.shape[0]
    b = jnp.zeros((n, 6), q.dtype)
    b = b.at[graph.edge_i].add(
        jnp.einsum("ekr,ek->er", Ji, wr, precision=hi))
    b = b.at[graph.edge_j].add(
        jnp.einsum("ekr,ek->er", Jj, wr, precision=hi))
    return r0, Ji, Jj, b


def _make_hvp(graph: PoseGraph, Ji, Jj, n: int, damping, anchor):
    """Matrix-free normal-matrix product v -> (H + damping I + anchor) v.

    One gather + two batched (E, 6, 6) x (E, 6) products + one scatter-add
    per application — O(E) memory instead of the dense path's O(36 N^2).
    The gauge anchor adds ``anchor`` to node 0's diagonal block."""
    hi = jax.lax.Precision.HIGHEST
    w = graph.weight[:, None]

    def hvp(v):
        yi = jnp.einsum("ekr,er->ek", Ji, v[graph.edge_i], precision=hi)
        yj = jnp.einsum("ekr,er->ek", Jj, v[graph.edge_j], precision=hi)
        wy = (yi + yj) * w
        out = jnp.zeros((n, 6), v.dtype)
        out = out.at[graph.edge_i].add(
            jnp.einsum("ekr,ek->er", Ji, wy, precision=hi))
        out = out.at[graph.edge_j].add(
            jnp.einsum("ekr,ek->er", Jj, wy, precision=hi))
        out = out + damping * v
        return out.at[0].add(anchor * v[0])

    return hvp


def _block_jacobi_inv(graph: PoseGraph, Ji, Jj, n: int, damping, anchor):
    """Inverse diagonal 6x6 blocks of H (block-Jacobi preconditioner)."""
    hi = jax.lax.Precision.HIGHEST
    w = graph.weight[:, None, None]
    Hii = jnp.matmul(jnp.swapaxes(Ji, 1, 2), Ji * w, precision=hi)
    Hjj = jnp.matmul(jnp.swapaxes(Jj, 1, 2), Jj * w, precision=hi)
    D = jnp.zeros((n, 6, 6), Ji.dtype)
    D = D.at[graph.edge_i].add(Hii)
    D = D.at[graph.edge_j].add(Hjj)
    D = D + damping * jnp.eye(6, dtype=Ji.dtype)
    D = D.at[0].add(anchor * jnp.eye(6, dtype=Ji.dtype))
    return jnp.linalg.inv(D)


def _pcg(hvp, Minv, b, iters: int):
    """Fixed-iteration preconditioned CG for H x = -b (x0 = 0). A static
    trip count keeps the whole solve one fused lax.scan — no host syncs or
    data-dependent control flow (TPU/XLA friendly); a residual-based early
    exit would buy nothing at these sizes."""
    apply_M = lambda r: jnp.einsum("nij,nj->ni", Minv, r)
    x0 = jnp.zeros_like(b)
    r0 = -b  # residual of H x + b at x = 0
    z0 = apply_M(r0)
    p0 = z0

    def body(carry, _):
        x, r, z, p = carry
        Hp = hvp(p)
        rz = jnp.sum(r * z)
        denom = jnp.sum(p * Hp)
        alpha = rz / jnp.where(jnp.abs(denom) > 1e-30, denom, 1.0)
        x = x + alpha * p
        r_new = r - alpha * Hp
        z_new = apply_M(r_new)
        beta = jnp.sum(r_new * z_new) / jnp.where(jnp.abs(rz) > 1e-30, rz, 1.0)
        p = z_new + beta * p
        return (x, r_new, z_new, p), None

    (x, *_), _ = jax.lax.scan(body, (x0, r0, z0, p0), None, length=iters)
    return x


@partial(jax.jit, static_argnames=("iterations", "cg_iterations",
                                   "fix_first"))
def optimize_pcg(graph: PoseGraph, iterations: int = 10,
                 cg_iterations: int = 32, damping: float = 1e-4,
                 fix_first: bool = True,
                 anchor_weight: float = 1e6) -> PoseGraph:
    """Gauss-Newton with a matrix-free PCG inner solve.

    Scales past the dense path's ~10^3-node limit (ROADMAP item): memory is
    O(E) per Hv product instead of O(36 N^2) for the assembled H, and each
    CG iteration is gather + batched 6x6 matvecs + scatter-add — all
    MXU/VPU-batched with static shapes. Block-Jacobi preconditioning keeps
    CG iteration counts low on chain+loop graphs.
    """
    n = graph.q.shape[0]
    anchor = anchor_weight if fix_first else 0.0

    def gn_iter(carry, _):
        q, t = carry
        _r0, Ji, Jj, b = _edge_partials(graph, q, t)
        hvp = _make_hvp(graph, Ji, Jj, n, damping, anchor)
        Minv = _block_jacobi_inv(graph, Ji, Jj, n, damping, anchor)
        dx = _pcg(hvp, Minv, b, cg_iterations)
        new = jax.vmap(lambda qq, tt, xi: se3.retract(se3.Pose(qq, tt), xi))(
            q, t, dx)
        return (new.q, new.t), None

    (q, t), _ = jax.lax.scan(gn_iter, (graph.q, graph.t), None,
                             length=iterations)
    return graph._replace(q=q, t=t)


def pad_edges(graph: PoseGraph, multiple: int) -> PoseGraph:
    """Pad the edge arrays to a multiple (for even dp sharding) with
    zero-weight identity self-edges on node 0 — they contribute nothing."""
    e = graph.edge_i.shape[0]
    target = ((e + multiple - 1) // multiple) * multiple
    pad = target - e
    if pad == 0:
        return graph
    zq = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], graph.q.dtype), (pad, 1))
    zt = jnp.zeros((pad, 3), graph.t.dtype)
    return graph._replace(
        edge_i=jnp.concatenate([graph.edge_i, jnp.zeros((pad,), jnp.int32)]),
        edge_j=jnp.concatenate([graph.edge_j, jnp.zeros((pad,), jnp.int32)]),
        meas_q=jnp.concatenate([graph.meas_q, zq]),
        meas_t=jnp.concatenate([graph.meas_t, zt]),
        weight=jnp.concatenate([graph.weight,
                                jnp.zeros((pad,), graph.weight.dtype)]),
    )


def pad_nodes(graph: PoseGraph, multiple: int) -> PoseGraph:
    """Pad the node arrays to a multiple with identity poses touched by no
    edge — their normal-equation block is damping-only, so their update is
    exactly zero and the solve over real nodes is unaffected. Bounds jit
    recompiles of the optimizers to one graph per padded size (the
    incremental-smoothing path calls the optimizer once per loop closure)."""
    n = graph.q.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    pad = target - n
    if pad == 0:
        return graph
    iq = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], graph.q.dtype), (pad, 1))
    it = jnp.zeros((pad, 3), graph.t.dtype)
    return graph._replace(q=jnp.concatenate([graph.q, iq]),
                          t=jnp.concatenate([graph.t, it]))


def make_sharded_optimize(mesh, n_nodes: int, iterations: int = 10,
                          damping: float = 1e-6, fix_first: bool = True):
    """Distributed pose-graph GN: EDGES sharded over dp (keyframe residuals
    computed shard-locally), dense normal-system partials combined by ONE
    psum per iteration, replicated solve/update — the same
    partials+collectives recipe as the sharded ICP step and BA
    (SURVEY.md §2.6). Poses are replicated (the keyframe set is small; the
    work scales with edges).

    Returns ``run(graph) -> PoseGraph`` for a graph whose edge arrays are
    evenly divisible by the dp size (see :func:`pad_edges`).
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from icp_tpu.parallel.mesh import DP_AXIS

    n = n_nodes

    def gn_local(graph: PoseGraph) -> PoseGraph:
        def gn_iter(carry, _):
            q, t = carry
            H, b, _cost = _assemble_system(graph, q, t, n)
            # Combine shard partials — the only collective per iteration.
            H = jax.lax.psum(H, DP_AXIS)
            b = jax.lax.psum(b, DP_AXIS)
            q, t = _solve_and_retract(H, b, q, t, n, damping, fix_first)
            return (q, t), None

        (q, t), _ = jax.lax.scan(gn_iter, (graph.q, graph.t), None,
                                 length=iterations)
        return graph._replace(q=q, t=t)

    spec_edges = PoseGraph(
        q=P(), t=P(),
        edge_i=P(DP_AXIS), edge_j=P(DP_AXIS),
        meas_q=P(DP_AXIS), meas_t=P(DP_AXIS), weight=P(DP_AXIS))
    spec_out = PoseGraph(
        q=P(), t=P(),
        edge_i=P(DP_AXIS), edge_j=P(DP_AXIS),
        meas_q=P(DP_AXIS), meas_t=P(DP_AXIS), weight=P(DP_AXIS))
    sharded = shard_map(gn_local, mesh=mesh, in_specs=(spec_edges,),
                        out_specs=spec_out, check_vma=False)
    return jax.jit(sharded)


def graph_cost(graph: PoseGraph) -> jnp.ndarray:
    """Total weighted squared residual of the graph (diagnostic)."""
    poses_i = se3.Pose(graph.q[graph.edge_i], graph.t[graph.edge_i])
    poses_j = se3.Pose(graph.q[graph.edge_j], graph.t[graph.edge_j])
    meas = se3.Pose(graph.meas_q, graph.meas_t)
    zero = jnp.zeros((6,), graph.t.dtype)
    r = jax.vmap(lambda pi, pj, m: edge_residual(zero, zero, pi, pj, m))(
        poses_i, poses_j, meas)
    return jnp.sum(r * r * graph.weight[:, None])
