"""Bisect the sharded pose-graph NaN at 600 nodes (round-3 debugging)."""

from __future__ import annotations

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icp_tpu.parallel.mesh import make_mesh  # noqa: E402
from icp_tpu.slam import se3  # noqa: E402
from icp_tpu.slam.pose_graph import (  # noqa: E402
    PoseGraph, make_sharded_optimize, optimize, optimize_pcg, pad_edges,
    graph_cost)


def circle_graph(n, rng, noise_t=0.5, noise_deg=0.05, n_loops=30):
    """Chain around a circle of radius 400 mm + n_loops closures."""
    ts = np.stack([[400 * np.cos(2 * np.pi * i / n), 0.0,
                    400 * np.sin(2 * np.pi * i / n)] for i in range(n)],
                  ).astype(np.float32)
    qs = np.tile(np.array([0, 0, 0, 1], np.float32), (n, 1))
    gt = [se3.Pose(jnp.asarray(qs[i]), jnp.asarray(ts[i])) for i in range(n)]

    edges = [(i, i + 1) for i in range(n - 1)]
    loop_idx = rng.integers(0, n - 60, n_loops)
    edges += [(int(i), int(i) + 50) for i in loop_idx]

    meas_q, meas_t = [], []
    for (i, j) in edges:
        rel = se3.relative(gt[i], gt[j])
        dq = noise_deg * np.pi / 180 * rng.normal(0, 1, 3)
        nq = se3.exp(jnp.asarray(np.concatenate([
            rng.normal(0, noise_t, 3), dq]).astype(np.float32)))
        noisy = se3.compose(nq, rel)
        meas_q.append(noisy.q)
        meas_t.append(noisy.t)

    # Initial guess: integrate the chain (drifts), identity attitude.
    init_t = [np.zeros(3, np.float32)]
    init_q = [np.array([0, 0, 0, 1], np.float32)]
    cur = se3.Pose(jnp.asarray(init_q[0]), jnp.asarray(init_t[0]))
    for k in range(n - 1):
        cur = se3.compose(cur, se3.Pose(meas_q[k], meas_t[k]))
        init_q.append(np.asarray(cur.q))
        init_t.append(np.asarray(cur.t))

    return PoseGraph(
        q=jnp.asarray(np.stack(init_q)), t=jnp.asarray(np.stack(init_t)),
        edge_i=jnp.asarray(np.asarray([e[0] for e in edges], np.int32)),
        edge_j=jnp.asarray(np.asarray([e[1] for e in edges], np.int32)),
        meas_q=jnp.stack(meas_q), meas_t=jnp.stack(meas_t),
        weight=jnp.ones((len(edges),), jnp.float32))


def stats(tag, g):
    nan = bool(jnp.any(jnp.isnan(g.q)) | jnp.any(jnp.isnan(g.t)))
    print(f"  {tag}: nan={nan} cost={float(graph_cost(g)):.4g}")
    return nan


def main():
    rng = np.random.default_rng(0)
    mesh = make_mesh(8, 1)
    for n in (64, 256, 600):
        g = circle_graph(n, rng)
        print(f"n={n}, E={g.edge_i.shape[0]} (init cost "
              f"{float(graph_cost(g)):.4g})")
        t0 = time.time()
        single = jax.block_until_ready(optimize(g, iterations=6))
        print(f"  dense single: {time.time()-t0:.1f}s", end="")
        stats("", single)
        t0 = time.time()
        pcg = jax.block_until_ready(optimize_pcg(g, iterations=6))
        print(f"  pcg: {time.time()-t0:.1f}s", end="")
        stats("", pcg)
        gp = pad_edges(g, 8)
        run = make_sharded_optimize(mesh, n_nodes=n, iterations=6)
        t0 = time.time()
        sh = jax.block_until_ready(run(gp))
        print(f"  sharded dense: {time.time()-t0:.1f}s", end="")
        if not stats("", sh):
            dt = float(jnp.abs(sh.t - single.t).max())
            print(f"  max|t diff| vs single: {dt:.3g} mm")


if __name__ == "__main__":
    main()
