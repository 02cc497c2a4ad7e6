"""Stage breakdown of the FUSED hot loop at configurable shapes.

Times the three per-iteration stages of the fused POINT pipeline
(rep_assign_pallas -> group_rows_by_bin -> bin_point_moments_pallas+solve)
plus the full icp_step, loop-inside-one-dispatch with marginal
differencing (see bench.py / axon notes). Run several shapes back-to-back
in ONE process so chip drift cancels:

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_fused_stages.py \
        65536x1024 65536x256 16384x256
"""

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 120, 24


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
    print(f"  {label:48s} {per_op*1e3:8.4f} ms/op")
    return per_op * 1e3


def profile_shape(m, n_r):
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.quaternion import qidentity
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from icp_tpu.kernels.fused_step import (
        bin_point_moments_pallas, point_moments_from_P, prep_rep_assign,
        prep_similarity, rep_assign_pallas)
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from __graft_entry__ import _synthetic_pair

    print(f"shape m={m} n_r={n_r}")
    config = ICPConfig(m=m, n_r=n_r)
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(m)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(jax.jit(
        lambda f: build_index(f, params, config))(jnp.asarray(fixed_np)))
    use_pallas = jax.default_backend() == "tpu"

    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)

    def assign_body():
        def body(i, mv):
            rid = rep_assign_pallas(mv, C, srow)
            return mv + (rid[0] * 1e-20).astype(mv.dtype)
        return body
    t1 = timed("rep_assign_pallas", assign_body, moving) if use_pallas else 0

    rid0 = jax.block_until_ready(rep_assign_pallas(moving, C, srow)
                                 if use_pallas else
                                 jnp.zeros((m,), jnp.int32))

    def group_body():
        def body(i, mv):
            gl = group_rows_by_bin(rid0, n_r, config.query_capacity, (mv,))
            return mv * (1.0 + gl.grouped[0][0, 0, 0] * 1e-30)
        return body
    t2 = timed("group_rows_by_bin", group_body, moving)

    gl = group_rows_by_bin(rid0, n_r, config.query_capacity, (moving,))
    mg = jax.block_until_ready(gl.grouped[0])
    qvalid = jax.block_until_ready(gl.valid.astype(jnp.float32))

    if use_pallas:
        def mom_body():
            def body(i, m_):
                P = bin_point_moments_pallas(
                    m_, qvalid, index.reps, index.bins_centered,
                    index.sq_b_masked, G, b_row, params.alpha, weighted=True)
                return m_ * (1.0 + P[0, 0, 0] * 1e-30)
            return body
        t3 = timed("bin_point_moments_pallas", mom_body, mg)

        def tail_body():
            def body(i, m_):
                P = bin_point_moments_pallas(
                    m_, qvalid, index.reps, index.bins_centered,
                    index.sq_b_masked, G, b_row, params.alpha, weighted=True)
                S11, mf, mm_, W = point_moments_from_P(P, index.reps,
                                                       params.c,
                                                       index.moment_w)
                return m_ * (1.0 + S11[0] * 1e-30)
            return body
        t4 = timed("  + moment translation (hoisted W matvec)", tail_body, mg)

    def step_body():
        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return body
    t5 = timed("icp_step (full iteration)", step_body, identity_state(),
               )
    return t5


def main():
    shapes = [tuple(int(x) for x in a.split("x")) for a in sys.argv[1:]] \
        or [(65536, 1024), (65536, 256), (16384, 256)]
    for m, n_r in shapes:
        profile_shape(m, n_r)


if __name__ == "__main__":
    main()
