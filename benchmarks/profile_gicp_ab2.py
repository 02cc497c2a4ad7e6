"""Tight alternating A/B: GICP sublane vs rowcat at bb=16, composed.

profile_gicp_composed's single-pass ordering showed rowcat ~3-5% ahead of
sublane but with cross-pass drift of the same order. This probe alternates
the two variants A,B,A,B,... NPAIRS times in one process and reports the
per-pair delta distribution — the decision statistic is the MEDIAN pairwise
delta, which drift (slowly varying chip clock) cancels to first order.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 120, 24
NPAIRS = 5


def main():
    from icp_tpu import ICPConfig, ICPParams, Objective
    from icp_tpu.icp.plane import CHARACTERISTIC_LENGTH_MM, solve_plane_system
    from icp_tpu.icp.quaternion import qmul, qnormalize, qrotate
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.kernels import fused_gn
    from icp_tpu.ops.normals import normals_for
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.rbc.search import rbc_point_assign
    from __graft_entry__ import _synthetic_pair

    cfg = ICPConfig(objective=Objective.GICP, estimate_scale=False)
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(16384)
    fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, cfg))(fixed))
    mn = jax.block_until_ready(normals_for(moving, cfg.normal_mode))
    n_r, cq = cfg.n_r, cfg.query_capacity

    def body_builder(layout, bb):
        def body(i, carry):
            q, t = carry
            s = jnp.float32(1.0)
            rid, G, b_row = rbc_point_assign(index, moving, q, t, s,
                                             params.alpha, use_pallas=True)
            gl = group_rows_by_bin(rid, n_r, cq,
                                   (moving, qrotate(q, mn)))
            mg, nm_g = gl.grouped
            qvalid = gl.valid.astype(moving.dtype)
            P, P_z = fused_gn.bin_gn_moments_pallas(
                mg, nm_g, qvalid, index.reps, index.bins_vals12,
                index.sq_b_masked, G, b_row, params.alpha, mode="gicp",
                weighted=True, gicp_eps=params.gicp_epsilon,
                bin_batch=bb, v_layout=layout)
            P = P + fused_gn.gicp_const_moment(P_z)
            V = fused_gn.gn_v_total(P, index.reps, index.gn_w)
            H, b = fused_gn.gn_system_from_V(V, CHARACTERISTIC_LENGTH_MM)
            qk, tk = solve_plane_system(H, b)
            return qnormalize(qmul(qk, q)), qrotate(qk, t) + tk
        return body

    st0 = identity_state()
    carry0 = (st0.q, jnp.zeros((3,), jnp.float32))

    runners = {}
    for layout in ("sublane", "rowcat"):
        @partial(jax.jit, static_argnames=("n",))
        def run(c, n, _layout=layout):
            return jax.lax.fori_loop(0, n, body_builder(_layout, 16), c)
        runners[layout] = run

    def t_of(layout, n, reps=3):
        run = runners[layout]
        out = run(carry0, n)
        float(np.asarray(out[1]).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(carry0, n)
            float(np.asarray(out[1]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    # Warm both compiles fully before any timing.
    for lay in ("sublane", "rowcat"):
        t_of(lay, N_HI, reps=1)
        t_of(lay, N_LO, reps=1)

    deltas = []
    for p in range(NPAIRS):
        per = {}
        for lay in ("sublane", "rowcat"):
            per[lay] = (t_of(lay, N_HI) - t_of(lay, N_LO)) / (N_HI - N_LO)
        d = (per["sublane"] - per["rowcat"]) * 1e3
        deltas.append(d)
        print(f"pair {p}: sublane {per['sublane']*1e3:.4f} "
              f"rowcat {per['rowcat']*1e3:.4f} delta {d:+.4f} ms", flush=True)
    print(f"median delta (sublane - rowcat): {np.median(deltas):+.4f} ms "
          f"(n={len(deltas)})", flush=True)


if __name__ == "__main__":
    main()
