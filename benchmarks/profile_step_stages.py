"""Staged breakdown of icp_step: cumulative sub-chains, loop-timed.

Timing method: forced HOST READ of the result (block_until_ready returns
at enqueue under the axon tunnel) + (T(N_HI) - T(N_LO)) / (N_HI - N_LO)
marginal differencing to cancel the dispatch floor — same as bench.py.
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 200, 40


def timed(label, body_builder, carry0, reps=3):
    @partial(jax.jit, static_argnames=("n",))
    def run(c, n):
        return jax.lax.fori_loop(0, n, body_builder(), c)

    def t_of(n):
        def once():
            out = run(carry0, n)
            first = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(first).ravel()[0])  # force host read
        once()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_op = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
    print(f"{label:52s} {per_op*1e3:8.4f} ms/op")


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.quaternion import qidentity, transform_points
    from icp_tpu.icp.run import build_index
    from icp_tpu.ops.distance import metric_weights, pairwise_sq_dists
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.kernels.bin_search import bin_search_pallas
    from icp_tpu.ops import moments
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig()
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(config.m)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(jax.jit(
        lambda f: build_index(f, params, config))(jnp.asarray(fixed_np)))
    cq = config.query_capacity

    def stage_a():  # transform + phase1
        def body(i, mv):
            tm = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            d2 = pairwise_sq_dists(tm, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1).astype(jnp.int32)
            return mv + (rid[:, None] * 1e-20).astype(mv.dtype)
        return body

    def stage_b():  # + payload-sort grouping (production path)
        def body(i, mv):
            tm = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            d2 = pairwise_sq_dists(tm, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1).astype(jnp.int32)
            g = group_rows_by_bin(rid, config.n_r, cq, (tm,))
            return mv + (g.grouped[0][0, 0, 0] * 1e-20).astype(mv.dtype)
        return body

    def stage_c():  # + centering + qg_w/sq_q
        def body(i, mv):
            tm = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            d2 = pairwise_sq_dists(tm, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1).astype(jnp.int32)
            g = group_rows_by_bin(rid, config.n_r, cq, (tm,))
            qg = g.grouped[0] - index.reps[:, None, :]
            w8 = metric_weights(params.alpha, tm.dtype)
            qg_w = qg * w8
            sq_q = jnp.sum(qg_w * qg, -1)
            return mv + (jnp.mean(sq_q) * 1e-20).astype(mv.dtype)
        return body

    def stage_d():  # + pallas kernel
        def body(i, mv):
            tm = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            d2 = pairwise_sq_dists(tm, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1).astype(jnp.int32)
            g = group_rows_by_bin(rid, config.n_r, cq, (tm,))
            qg = g.grouped[0] - index.reps[:, None, :]
            w8 = metric_weights(params.alpha, tm.dtype)
            qg_w = qg * w8
            score, matched = bin_search_pallas(
                qg_w, index.bins_centered, index.sq_b_masked, index.bins)
            return mv + (jnp.mean(score) * 1e-20).astype(mv.dtype)
        return body

    def stage_e():  # full step
        from icp_tpu.icp.state import identity_state
        from icp_tpu.icp.step import icp_step

        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return body

    timed("A transform+phase1", stage_a, moving)
    timed("B +grouping", stage_b, moving)
    timed("C +gather/centering", stage_c, moving)
    timed("D +pallas kernel", stage_d, moving)
    from icp_tpu.icp.state import identity_state
    timed("E full icp_step", stage_e, identity_state())


if __name__ == "__main__":
    main()
