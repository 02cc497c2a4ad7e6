"""Pose-graph optimization tests."""

import numpy as np
import jax.numpy as jnp

from icp_tpu.slam import se3
from icp_tpu.slam.pose_graph import (
    PoseGraph,
    graph_cost,
    graph_from_poses,
    optimize,
)
from tests.utils import random_quat


def _chain_with_loop(rng, n=8, noise=0.02):
    """Ground-truth poses on a loop; odometry edges with noise + one exact
    loop-closure edge. Optimization must pull the drifted chain back."""
    gt = [se3.Pose.identity()]
    for i in range(1, n):
        ang = 2 * np.pi / n
        q = np.array([0, np.sin(ang / 2), 0, np.cos(ang / 2)], np.float32)
        step = se3.Pose(jnp.asarray(q), jnp.asarray(
            np.array([100.0, 0.0, 20.0], np.float32)))
        gt.append(se3.compose(gt[-1], step))

    edges, meas = [], []
    est = [gt[0]]
    for i in range(n - 1):
        z = se3.relative(gt[i], gt[i + 1])
        # Perturb the measurement (odometry noise).
        xi = rng.normal(size=6).astype(np.float32) * noise
        xi[:3] *= 20.0  # translation noise in mm
        z_noisy = se3.compose(se3.exp(jnp.asarray(xi)), z)
        edges.append((i, i + 1))
        meas.append(z_noisy)
        est.append(se3.compose(est[-1], z_noisy))

    # Exact loop closure from last to first.
    edges.append((n - 1, 0))
    meas.append(se3.relative(gt[n - 1], gt[0]))

    graph = graph_from_poses([p.q for p in est], [p.t for p in est],
                             edges, meas)
    return graph, gt


def test_optimize_reduces_cost(rng):
    graph, gt = _chain_with_loop(rng)
    c0 = float(graph_cost(graph))
    out = optimize(graph, iterations=10)
    c1 = float(graph_cost(out))
    # Noisy odometry + exact loop closure are mutually inconsistent, so the
    # least-squares optimum has a nonzero residual floor; GN reaches it in
    # ~1 iteration on this graph.
    assert c1 < c0 * 0.2, (c0, c1)
    # And it is a fixed point: more iterations do not diverge.
    c2 = float(graph_cost(optimize(graph, iterations=20)))
    assert c2 <= c1 * 1.01


def test_optimize_perfect_graph_is_fixed_point(rng):
    """A graph whose measurements exactly match its poses must not move."""
    poses = [se3.Pose.identity()]
    for i in range(4):
        step = se3.Pose(jnp.asarray(random_quat(rng, 0.2)),
                        jnp.asarray(rng.normal(size=3).astype(np.float32) * 50))
        poses.append(se3.compose(poses[-1], step))
    edges = [(i, i + 1) for i in range(4)] + [(0, 4)]
    meas = [se3.relative(poses[i], poses[j]) for i, j in edges]
    graph = graph_from_poses([p.q for p in poses], [p.t for p in poses],
                             edges, meas)
    out = optimize(graph, iterations=5)
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(graph.t),
                               atol=1e-2)


def test_optimize_closes_loop(rng):
    """After optimization the chain endpoint must respect the loop-closure
    edge much better than the drifted initialization."""
    graph, gt = _chain_with_loop(rng, n=8, noise=0.03)
    out = optimize(graph, iterations=15)

    def endpoint_err(g):
        # residual of the loop edge (last -> first)
        pi = se3.Pose(g.q[-1], g.t[-1])
        pj = se3.Pose(g.q[0], g.t[0])
        z = se3.Pose(g.meas_q[-1], g.meas_t[-1])
        r = se3.log(se3.compose(se3.inverse(z),
                                se3.compose(se3.inverse(pi), pj)))
        return float(jnp.linalg.norm(r[:3]))

    # With equal edge weights the optimum distributes residual across all
    # edges, so the loop edge keeps a share of the total inconsistency.
    assert endpoint_err(out) < endpoint_err(graph) * 0.25


def test_sharded_optimize_matches_single(rng):
    """Edge-sharded pose-graph GN over an 8-way mesh == single-device."""
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.slam.pose_graph import make_sharded_optimize, pad_edges
    import jax

    graph, _ = _chain_with_loop(rng)
    single = optimize(graph, iterations=8)

    mesh = make_mesh(8, 1)
    padded = pad_edges(graph, 8)
    run = make_sharded_optimize(mesh, n_nodes=graph.q.shape[0], iterations=8)
    out = jax.block_until_ready(run(padded))

    np.testing.assert_allclose(np.asarray(out.t), np.asarray(single.t),
                               atol=1e-3)
    c = float(graph_cost(out._replace(
        edge_i=graph.edge_i, edge_j=graph.edge_j, meas_q=graph.meas_q,
        meas_t=graph.meas_t, weight=graph.weight)))
    assert c < float(graph_cost(graph)) * 0.2


def test_anchor_fixed(rng):
    graph, _ = _chain_with_loop(rng)
    out = optimize(graph, iterations=5)
    np.testing.assert_allclose(np.asarray(out.t[0]), np.zeros(3), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out.q[0]),
                               np.array([0, 0, 0, 1.0]), atol=1e-4)


def test_pcg_matches_dense(rng):
    """Matrix-free PCG GN must land where the dense solve lands."""
    from icp_tpu.slam.pose_graph import optimize_pcg

    graph, _ = _chain_with_loop(rng, n=8, noise=0.02)
    dense = optimize(graph, iterations=8)
    pcg = optimize_pcg(graph, iterations=8, cg_iterations=64, damping=1e-6)
    # Same optimum basin; sub-mm agreement on ~100 mm translations (the two
    # paths differ in gauge-anchor magnitude and f32 CG truncation).
    np.testing.assert_allclose(np.asarray(pcg.t), np.asarray(dense.t),
                               atol=0.5)
    c_dense = float(graph_cost(dense))
    c_pcg = float(graph_cost(pcg))
    assert c_pcg <= c_dense * 1.05


def _circle_graph(rng, n=64, noise_t=0.5, noise_deg=0.05, n_loops=8):
    """Chain around a 400 mm circle + long-range loop closures, initialized
    by integrating the noisy chain (the classic pose-graph stress case).
    Plain GN with fixed tiny damping DIVERGES to NaN on this graph — the
    first step overshoots by meters (round-3 bisect) — so this doubles as
    the LM accept/reject regression fixture."""
    ts = np.stack([[400 * np.cos(2 * np.pi * i / n), 0.0,
                    400 * np.sin(2 * np.pi * i / n)] for i in range(n)],
                  ).astype(np.float32)
    gt = [se3.Pose(jnp.asarray(np.array([0, 0, 0, 1], np.float32)),
                   jnp.asarray(ts[i])) for i in range(n)]
    span = min(50, n - 10)
    edges = [(i, i + 1) for i in range(n - 1)]
    edges += [(int(i), int(i) + span)
              for i in rng.integers(0, n - span - 1, n_loops)]
    meas = []
    for (i, j) in edges:
        xi = np.concatenate([rng.normal(0, noise_t, 3),
                             noise_deg * np.pi / 180 * rng.normal(0, 1, 3)])
        meas.append(se3.compose(se3.exp(jnp.asarray(xi.astype(np.float32))),
                                se3.relative(gt[i], gt[j])))
    init = [se3.Pose.identity()]
    for k in range(n - 1):
        init.append(se3.compose(init[-1], meas[k]))
    return graph_from_poses([p.q for p in init], [p.t for p in init],
                            edges, meas)


def test_lm_survives_divergent_graph(rng):
    """Regression: the 64-node circle graph on which undamped GN (fixed
    damping=1e-6) diverged to NaN in <6 iterations. LM accept/reject must
    stay finite AND converge."""
    graph = _circle_graph(rng)
    c0 = float(graph_cost(graph))
    out = optimize(graph, iterations=10)
    assert not bool(jnp.any(jnp.isnan(out.q)) | jnp.any(jnp.isnan(out.t)))
    c1 = float(graph_cost(out))
    assert np.isfinite(c1) and c1 < c0 * 0.2, (c0, c1)


def test_lm_pcg_survives_divergent_graph(rng):
    from icp_tpu.slam.pose_graph import optimize_pcg

    graph = _circle_graph(rng)
    out = optimize_pcg(graph, iterations=10, cg_iterations=64)
    c1 = float(graph_cost(out))
    assert np.isfinite(c1) and c1 < float(graph_cost(graph)) * 0.2


def test_sharded_pcg_matches_single(rng):
    """Edge-sharded matrix-free LM-PCG over an 8-way mesh lands in the same
    optimum basin as the single-device dense LM."""
    import jax

    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.slam.pose_graph import (make_sharded_optimize_pcg,
                                         pad_edges)

    graph = _circle_graph(rng)
    single = optimize(graph, iterations=8)

    mesh = make_mesh(8, 1)
    run = make_sharded_optimize_pcg(mesh, n_nodes=graph.q.shape[0],
                                    iterations=8, cg_iterations=64)
    out = jax.block_until_ready(run(pad_edges(graph, 8)))

    c_single = float(graph_cost(single))
    c_out = float(graph_cost(graph._replace(q=out.q, t=out.t)))
    assert np.isfinite(c_out) and c_out <= c_single * 1.25, (c_single, c_out)
    # Same basin: node positions agree to a few mm on a 400 mm circle.
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(single.t),
                               atol=8.0)


def test_pcg_scales_to_large_graph(rng):
    """A 256-node loop with several closures: PCG must reduce cost sharply
    without ever materializing the (256*6)^2 dense system."""
    from icp_tpu.slam.pose_graph import optimize_pcg

    graph, _ = _chain_with_loop(rng, n=256, noise=0.01)
    c0 = float(graph_cost(graph))
    out = optimize_pcg(graph, iterations=10, cg_iterations=96)
    c1 = float(graph_cost(out))
    assert c1 < c0 * 0.2, (c0, c1)
    np.testing.assert_allclose(np.asarray(out.t[0]), np.zeros(3), atol=1e-2)
