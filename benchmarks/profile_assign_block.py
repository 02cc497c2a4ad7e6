"""Composed A/B: rep-assign block_m scan at the flagship shape.

rep_assign_pallas reads 512 KB, computes a 0.2 GFLOP K=8 matmul + argmin,
and writes 64 KB — yet costs ~76 us/iteration (docs/PERF_TABLE.md), which
smells like grid/launch overhead at block_m=2048 (8 steps). The round-1
_auto_block_m capped the score block at ~2 MB VMEM under the old 16 MB
Mosaic default; the raised 64 MB limit admits block_m up to the full m
(16 MB score block, ONE grid step). This measures the full POINT
iteration per block_m, same-process marginal differencing.
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 120, 24


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.horn import solve_step_transform
    from icp_tpu.icp.quaternion import qmul, qnormalize, qrotate
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.kernels.fused_step import (prep_rep_assign,
                                            prep_similarity,
                                            rep_assign_pallas)
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.rbc.search import rbc_point_moments_grouped
    from __graft_entry__ import _synthetic_pair

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_r = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    cfg = ICPConfig(m=m, n_r=n_r)
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(m)
    fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, cfg))(fixed))
    cq = cfg.query_capacity
    print(f"shapes: m={m} n_r={n_r} cq={cq}", flush=True)

    def body_builder(block_m: int):
        def body(i, carry):
            q, t, s = carry
            G, b_row = prep_similarity(q, t, s)
            C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)
            rid = rep_assign_pallas(moving, C, srow, block_m=block_m)
            gl = group_rows_by_bin(rid, n_r, cq, (moving,), use_pallas=True)
            S11, mean_f, mean_m, _ = rbc_point_moments_grouped(
                index, gl.grouped[0], gl.valid.astype(moving.dtype),
                G, b_row, params.alpha, params.c,
                weighted=True, use_pallas=True)
            qk, tk, sk = solve_step_transform(S11, mean_f, mean_m,
                                              mode="power",
                                              estimate_scale=False)
            return (qnormalize(qmul(qk, q)),
                    sk * qrotate(qk, t) + tk, sk * s)
        return body

    st0 = identity_state()
    carry0 = (st0.q, jnp.zeros((3,), jnp.float32), jnp.float32(1.0))

    def timed(label, block_m, reps=3):
        try:
            @partial(jax.jit, static_argnames=("n",))
            def run(c, n):
                return jax.lax.fori_loop(0, n, body_builder(block_m), c)

            def t_of(n):
                out = run(carry0, n)
                float(np.asarray(out[1]).ravel()[0])
                ts = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    out = run(carry0, n)
                    float(np.asarray(out[1]).ravel()[0])
                    ts.append(time.perf_counter() - t0)
                return min(ts)

            per = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
            print(f"{label:44s} {per*1e3:8.4f} ms/iter", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{label:44s} FAIL {' '.join(str(e).split())[:140]}",
                  flush=True)

    for bm in (2048, 4096, 8192, 16384):
        if m % bm == 0:
            timed(f"POINT iter, assign block_m={bm}", bm)
    timed("POINT iter, assign block_m=2048 (repeat)", 2048)


if __name__ == "__main__":
    main()
