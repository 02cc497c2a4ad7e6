"""Staged breakdown of icp_step: cumulative sub-chains, loop-timed."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 100


def timed(label, body_builder, carry0, n=N, reps=3):
    @jax.jit
    def run(c):
        return jax.lax.fori_loop(0, n, body_builder(), c)
    jax.block_until_ready(run(carry0))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry0))
        ts.append(time.perf_counter() - t0)
    print(f"{label:52s} {min(ts)*1e3/n:8.4f} ms/op")


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.quaternion import qidentity, transform_points
    from icp_tpu.icp.run import build_index
    from icp_tpu.ops.distance import metric_weights, pairwise_sq_dists
    from icp_tpu.rbc.grouping import group_by_bin
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

    def stage_b():  # + grouping
        def body(i, mv):
            tm = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            d2 = pairwise_sq_dists(tm, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1).astype(jnp.int32)
            g = group_by_bin(rid, config.n_r, cq)
            return mv + (g.member[0, 0] * 1e-20).astype(mv.dtype)
        return body

    def stage_c():  # + member gather + centering + qg_w/sq_q
        def body(i, mv):
            tm = transform_points(mv, qidentity(), jnp.zeros(3), jnp.float32(1.0))
            d2 = pairwise_sq_dists(tm, index.reps, params.alpha)
            rid = jnp.argmin(d2, 1).astype(jnp.int32)
            g = group_by_bin(rid, config.n_r, cq)
            qg = tm[g.member] - index.reps[:, None, :]
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
            g = group_by_bin(rid, config.n_r, cq)
            qg = tm[g.member] - index.reps[:, None, :]
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
