"""Composed A/B: Pallas bin-table build vs XLA row gather inside the full
POINT iteration (assign + group + moments + translate + solve +
accumulate), fori_loop marginal differencing, both variants in one process.
"""

from __future__ import annotations

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
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.rbc.search import (rbc_point_assign,
                                    rbc_point_moments_grouped)
    from __graft_entry__ import _synthetic_pair

    import sys

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

    def body_builder(table_pallas: bool):
        def body(i, carry):
            q, t, s = carry
            rid, G, b_row = rbc_point_assign(index, moving, q, t, s,
                                             params.alpha, use_pallas=True)
            gl = group_rows_by_bin(rid, n_r, cq, (moving,),
                                   use_pallas=table_pallas)
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

    def timed(label, table_pallas, reps=3):
        @partial(jax.jit, static_argnames=("n",))
        def run(c, n):
            return jax.lax.fori_loop(0, n, body_builder(table_pallas), c)

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

    timed("POINT iter, XLA table gather", False)
    timed("POINT iter, PALLAS table kernel", True)
    timed("POINT iter, XLA table gather (repeat)", False)
    timed("POINT iter, PALLAS table kernel (repeat)", True)


if __name__ == "__main__":
    main()
