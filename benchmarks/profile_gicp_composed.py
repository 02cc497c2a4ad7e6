"""Round-4 GICP layout A/B, COMPOSED (VERDICT r3 item 7).

Round 3's kernel-only scan measured "rowcat" (both GICP data rows reduced
by ONE dot_general with contraction depth 2*cq) a wash vs "sublane" (two
sequential row accumulations) — but batch preference is known to invert
when composed (fused_step._auto_bin_batch docstring), and the 64 MB Mosaic
limit has since admitted bigger batches. This probe times the FULL GICP
iteration body (assign + grouping + GN kernel + Woodbury const moment +
congruence + solve + accumulate) in one fori_loop per variant, marginal
differencing, all variants in one process so chip drift cancels.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 120, 24


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
    print(f"shapes: n_r={n_r} cq={cq} cb={index.bins_vals12.shape[1]}",
          flush=True)

    def body_builder(layout, bb):
        from icp_tpu.kernels.fused_step import prep_similarity

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

    def timed(label, layout, bb, reps=3):
        try:
            @partial(jax.jit, static_argnames=("n",))
            def run(c, n):
                return jax.lax.fori_loop(0, n, body_builder(layout, bb), c)

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
            print(f"{label:40s} {per*1e3:8.4f} ms/iter", flush=True)
        except Exception as e:  # noqa: BLE001 — legality recorded per row
            print(f"{label:40s} FAIL {' '.join(str(e).split())[:140]}",
                  flush=True)

    timed("gicp sublane bb=16 (production)", "sublane", 16)
    timed("gicp rowcat  bb=16", "rowcat", 16)
    timed("gicp rowcat  bb=32", "rowcat", 32)
    timed("gicp sublane bb=32", "sublane", 32)
    # Second pass interleaved to expose drift.
    timed("gicp sublane bb=16 (repeat)", "sublane", 16)
    timed("gicp rowcat  bb=16 (repeat)", "rowcat", 16)


if __name__ == "__main__":
    main()
