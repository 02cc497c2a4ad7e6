"""Interleaved A/B: fused GN kernel v-tensor layouts (kernels/fused_gn.py).

The GN moment contraction can lay the per-pair row tensor v out two ways:

  sublane: v (BB, cq, 8) — 8-lane rows pad to 128 lanes in VMEM (16x),
           one HIGHEST dot_general per GN row (3 for GICP); the original
           round-2 shipping layout (bytes/slot: plane 50 / gicp 118,
           forcing bin_batch 16 / 8 at the flagship shape).
  lane:    v (BB, 8, R*cq) — components on sublanes, rows x queries on
           lanes; built from cheap (BB, cq) scalar planes, pads R*cq to
           the next 128 multiple (12x smaller at cq=96) and GICP's three
           rows collapse into ONE dot_general.

This script (1) probes the max compiling bin_batch per (mode, layout) on
the real chip — the Mosaic scoped-VMEM error is the measurement — and
(2) times both layouts interleaved in one process (kernel-only scan loop,
marginal differencing, min over alternating rounds) at their best legal
bin_batch. Run on TPU.
"""

from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 60, 12
ROUNDS = 6


def main() -> None:
    from icp_tpu import ICPConfig, ICPParams, Objective
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
    index = build_index(fixed, params, cfg)
    st = identity_state()
    mn = normals_for(moving, cfg.normal_mode)
    rid, G, b_row = rbc_point_assign(index, moving, st.q, st.t, st.s,
                                     params.alpha, use_pallas=True)
    gl = group_rows_by_bin(rid, cfg.n_r, cfg.query_capacity, (moving, mn))
    mg, nm = gl.grouped
    qvalid = gl.valid.astype(moving.dtype)
    n_r, cq, _ = mg.shape
    cb = index.bins_vals12.shape[1]
    print(f"shapes: n_r={n_r} cq={cq} cb={cb}")

    def call(mode, layout, bb, x):
        out = fused_gn.bin_gn_moments_pallas(
            x, None if mode == "plane" else nm, qvalid, index.reps,
            index.bins_vals12, index.sq_b_masked, G, b_row, params.alpha,
            mode=mode, weighted=True, gicp_eps=1e-3, bin_batch=bb,
            v_layout=layout)
        # gicp returns (P, P_z) since the round-3 Woodbury split; fold
        # for shape-uniform timing (the add is noise).
        return out[0] + out[1] if isinstance(out, tuple) else out

    # Sublane bests are known from the round-2 _GN_BYTES_PER_SLOT
    # calibration (plane 16, gicp 8 at this shape); probe only the lane
    # layout, largest-first. Each failed probe costs a full Mosaic
    # compile, so the list is short.
    best_bb: dict[tuple[str, str], int] = {("plane", "sublane"): 16,
                                           ("gicp", "sublane"): 8}
    probes = [("plane", "lane", (64, 32, 16)),
              ("gicp", "lane", (64, 32, 16, 8))]
    for mode, layout, bbs in probes:
        for bb in bbs:
            if n_r % bb:
                continue
            try:
                jax.block_until_ready(call(mode, layout, bb, mg))
            except Exception as e:  # noqa: BLE001 - probing VMEM limit
                msg = str(e).split("\n")[0][:110]
                print(f"  {mode:10s} {layout:8s} bb={bb:3d} FAIL {msg}",
                      flush=True)
                continue
            best_bb[(mode, layout)] = bb
            print(f"  {mode:10s} {layout:8s} bb={bb:3d} ok", flush=True)
            break

    def make_runner(mode, layout, bb):
        @partial(jax.jit, static_argnames=("n",))
        def run(mg0, n):
            def body(c, _):
                P = call(mode, layout, bb, c)
                return c + P[0, 0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, mg0, None, length=n)
            return c

        def t_of(n):
            t0 = time.perf_counter()
            out = run(mg, n)
            float(np.asarray(out).ravel()[0])
            return time.perf_counter() - t0

        for n in (N_HI, N_LO):
            t_of(n)
        return t_of

    for mode in ("plane", "gicp"):
        runners = {lay: make_runner(mode, lay, best_bb[(mode, lay)])
                   for lay in ("sublane", "lane") if (mode, lay) in best_bb}
        best = {lay: {N_HI: float("inf"), N_LO: float("inf")}
                for lay in runners}
        for _ in range(ROUNDS):
            for lay, t_of in runners.items():
                for n in (N_HI, N_LO):
                    best[lay][n] = min(best[lay][n], t_of(n))
        for lay in runners:
            ms = (best[lay][N_HI] - best[lay][N_LO]) / (N_HI - N_LO) * 1e3
            print(f"{mode:10s} {lay:8s} bb={best_bb[(mode, lay)]:3d} "
                  f"{ms:.4f} ms/kernel", flush=True)


if __name__ == "__main__":
    main()
