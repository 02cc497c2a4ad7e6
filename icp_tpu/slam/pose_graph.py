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
