"""Alternating A/B: POINT moments-kernel bin_batch at a given shape,
composed iteration (bb=32 is the round-3 flagship optimum; at n_r=1024
the grid is 4x deeper, so the grid-step/VMEM trade may invert).
argv: m n_r bb bb ... (first bb is the baseline; default 65536 1024 32 64).
"""

from __future__ import annotations

import sys
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ab_util import ab_compare


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.horn import solve_step_transform
    from icp_tpu.icp.quaternion import qmul, qnormalize, qrotate
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.kernels.fused_step import (bin_point_moments_pallas,
                                            prep_rep_assign,
                                            prep_similarity,
                                            rep_assign_counts_pallas)
    from icp_tpu.ops.moments import masked_weight_sum
    from icp_tpu.kernels.fused_step import point_moments_from_P
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.rbc.search import rbc_point_moments_grouped
    from __graft_entry__ import _synthetic_pair

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    n_r = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    cfg = ICPConfig(m=m, n_r=n_r)
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(m, seed=1)
    fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, cfg))(fixed))
    cq = cfg.query_capacity
    print(f"shapes: m={m} n_r={n_r} cq={cq}", flush=True)

    def body_builder(bb: int):
        def body(i, carry):
            q, t, s = carry
            G, b_row = prep_similarity(q, t, s)
            C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)
            rid, counts = rep_assign_counts_pallas(moving, C, srow)
            gl = group_rows_by_bin(rid, n_r, cq, (moving,), use_pallas=True,
                                   counts=counts)
            P = bin_point_moments_pallas(
                gl.grouped[0], gl.valid.astype(moving.dtype), index.reps,
                index.bins_centered, index.sq_b_masked, G, b_row,
                params.alpha, weighted=True, bin_batch=bb)
            S11, mean_f, mean_m, _ = point_moments_from_P(
                P, index.reps, params.c)
            qk, tk, sk = solve_step_transform(S11, mean_f, mean_m,
                                              mode="power",
                                              estimate_scale=False)
            return (qnormalize(qmul(qk, q)),
                    sk * qrotate(qk, t) + tk, sk * s)
        return body

    st0 = identity_state()
    carry0 = (st0.q, jnp.zeros((3,), jnp.float32), jnp.float32(1.0))

    def make_run(bbs):
        @partial(jax.jit, static_argnames=("n",))
        def run(c, n):
            return jax.lax.fori_loop(0, n, body_builder(int(bbs)), c)
        return run

    bbs = tuple(sys.argv[3:]) or ("32", "64")
    ab_compare(make_run, bbs, carry0)


if __name__ == "__main__":
    main()
