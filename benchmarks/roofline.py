"""Roofline / MFU accounting for the fused POINT pipeline (VERDICT r4 #1).

For each per-iteration stage (rep-assign, grouping, search+moments) at the
flagship/4x/16x shapes, measures the composed-loop marginal latency and
sets it against an analytic speed-of-light (SOL) model of the v5e:

  * MXU issue: peak 197 TFLOP/s bf16 (TPU v5e datasheet number), derated
    by the contraction's pass count (HIGHEST f32 = 6 bf16 passes, dot3 =
    3 — docs/ROADMAP.md measured pass structure) and by systolic-array
    occupancy: a dim pinned at 8 fills 8/128 of the K rows (score
    contractions: K = point dim = 8) or of the N lanes (matched-gather:
    N = 8). This occupancy derate is the workload's intrinsic ceiling —
    8-D photogeometric points put an 8 on one axis of EVERY hot matmul,
    so raw-peak MFU is architecturally capped at 8/128 = 6.25% per pass
    before precision passes. See docs/PERF_TABLE.md for the narrative.
  * HBM: 819 GB/s on bytes actually crossing HBM (block inputs/outputs;
    VMEM-resident intermediates are free).
  * The grouping stage is an XLA key+payload sort — modeled as HBM passes
    only (lower bound), labeled sort-bound.

Prints a markdown table (for docs/PERF_TABLE.md) + one JSON line per row.

Run (serially, on the chip):
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/roofline.py
"""

from __future__ import annotations

import json
import sys
import time
from functools import partial

import numpy as np

PEAK_BF16 = 197e12      # FLOP/s, v5e datasheet
HBM_BW = 819e9          # B/s, v5e datasheet

SHAPES = [(16384, 256), (65536, 1024), (262144, 2048)]


def _stage_models(m, n_r, cq, cb):
    """Analytic per-iteration work model per stage.

    Returns {stage: dict(useful_flops, mxu_sol_s, hbm_bytes, bound)}.
    mxu_sol_s already folds pass count x occupancy derates per contraction.
    """
    def mxu_time(flops, passes, occ):
        return flops * passes / (PEAK_BF16 * occ)

    # rep-assign: dot3 (m,8)x(8,n_r), K=8 -> occupancy 8/128; 3 passes.
    rep_flops = 2.0 * m * n_r * 8
    rep = dict(
        useful_flops=rep_flops,
        mxu_sol_s=mxu_time(rep_flops, 3, 8 / 128),
        hbm_bytes=m * 32 + m * 4 + n_r * 4,  # points in, ids + counts out
        bound="MXU-issue (K=8, bf16x3)")

    # grouping: key+payload sort of m rows (32 B payload + 4 B key) +
    # padded-table build (one more pass over the payload). Model as 4 HBM
    # passes over (key+payload) — a LOWER bound; comparator sorts make
    # log-many passes, so measured >> model here is expected and the row
    # is labeled sort-bound rather than scored against it.
    grp_bytes = 4 * m * 36
    grp = dict(useful_flops=0.0, mxu_sol_s=0.0, hbm_bytes=grp_bytes,
               bound="sort (XLA key+payload)")

    # search+moments kernel, per bin over n_r bins:
    #   cross scores  dot3 (cq,8)x(cb,8)^T          K=8   occ 8/128, 3 passes
    #   matched gather HIGHEST (cq,cb)x(cb,8)       N=8   occ 8/128, 6 passes
    #   x G (8,8) and moment update (8,cq)x(cq,8)   MxN=8x8 occ (8/128)^2, 6
    cross = 2.0 * n_r * cq * cb * 8
    gather = 2.0 * n_r * cq * cb * 8
    mom = 2.0 * n_r * 8 * 8 * cq * 2  # u^T(u.w) + matched shift xG, approx
    mom_t = dict(
        useful_flops=cross + gather + mom,
        mxu_sol_s=(mxu_time(cross, 3, 8 / 128)
                   + mxu_time(gather, 6, 8 / 128)
                   + mxu_time(mom, 6, (8 / 128) ** 2)),
        hbm_bytes=(n_r * cq * 32          # grouped queries in
                   + n_r * cb * 32        # centered bins in
                   + n_r * cb * 4         # masked |b|^2 in
                   + n_r * 64 * 4),       # (8,8) moment matrices out
        bound="MXU-issue (K=8 / N=8)")
    return {"rep_assign": rep, "grouping": grp, "search_moments": mom_t}


def _timed(run, carry0, n_hi, n_lo, reps=3):
    import jax

    def t_of(n):
        def once():
            out = run(carry0, n)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        once()
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            once()
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (t_of(n_hi) - t_of(n_lo)) / (n_hi - n_lo)


def profile_shape(m, n_r, n_hi, n_lo):
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.quaternion import qidentity
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from icp_tpu.kernels.fused_step import (bin_point_moments_pallas,
                                            prep_rep_assign, prep_similarity,
                                            rep_assign_counts_pallas)
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig(m=m, n_r=n_r)
    cq, cb = config.query_capacity, config.bin_capacity
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(m)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(jax.jit(
        lambda f: build_index(f, params, config))(jnp.asarray(fixed_np)))

    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)

    @partial(jax.jit, static_argnames=("n",))
    def run_assign(mv, n):
        def body(i, mv):
            rid, _ = rep_assign_counts_pallas(mv, C, srow)
            return mv + (rid[0] * 1e-20).astype(mv.dtype)
        return jax.lax.fori_loop(0, n, body, mv)

    rid0 = jax.block_until_ready(
        rep_assign_counts_pallas(moving, C, srow)[0])

    @partial(jax.jit, static_argnames=("n",))
    def run_group(mv, n):
        def body(i, mv):
            gl = group_rows_by_bin(rid0, n_r, config.query_capacity, (mv,))
            return mv * (1.0 + gl.grouped[0][0, 0, 0] * 1e-30)
        return jax.lax.fori_loop(0, n, body, mv)

    gl = group_rows_by_bin(rid0, n_r, config.query_capacity, (moving,))
    mg = jax.block_until_ready(gl.grouped[0])
    qvalid = jax.block_until_ready(gl.valid.astype(jnp.float32))

    @partial(jax.jit, static_argnames=("n",))
    def run_mom(m_, n):
        def body(i, m_):
            P = bin_point_moments_pallas(
                m_, qvalid, index.reps, index.bins_centered,
                index.sq_b_masked, G, b_row, params.alpha, weighted=True)
            return m_ * (1.0 + P[0, 0, 0] * 1e-30)
        return jax.lax.fori_loop(0, n, body, m_)

    @partial(jax.jit, static_argnames=("n",))
    def run_step(st, n):
        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return jax.lax.fori_loop(0, n, body, st)

    times = {
        "rep_assign": _timed(run_assign, moving, n_hi, n_lo),
        "grouping": _timed(run_group, moving, n_hi, n_lo),
        "search_moments": _timed(run_mom, mg, n_hi, n_lo),
        "icp_step": _timed(run_step, identity_state(), n_hi, n_lo),
    }
    return times, _stage_models(m, n_r, cq, cb), (cq, cb)


def main():
    import sys

    shapes = SHAPES
    if len(sys.argv) > 2:  # e.g. `roofline.py 262144 2048` for one shape
        shapes = [(int(sys.argv[1]), int(sys.argv[2]))]
    rows = []
    total_rows = []
    for m, n_r in shapes:
        # Loop lengths scale down with the shape to bound runtime.
        n_hi, n_lo = (120, 24) if m <= 16384 else ((60, 12) if m <= 65536 else (20, 4))
        times, models, (cq, cb) = profile_shape(m, n_r, n_hi, n_lo)
        for stage in ("rep_assign", "grouping", "search_moments"):
            t = times[stage]
            mod = models[stage]
            fl = mod["useful_flops"]
            tf = fl / t / 1e12 if fl else 0.0
            hbm_t = mod["hbm_bytes"] / HBM_BW
            sol = max(mod["mxu_sol_s"], hbm_t)
            row = {
                "shape": f"{m}x{n_r}", "stage": stage,
                "measured_us": round(t * 1e6, 1),
                "useful_gflop": round(fl / 1e9, 3),
                "achieved_tflops": round(tf, 2),
                "pct_raw_peak": round(100 * tf * 1e12 / PEAK_BF16, 2),
                "sol_us": round(sol * 1e6, 1),
                "pct_of_sol": round(100 * sol / t, 1) if t > 0 else 0.0,
                "bound": mod["bound"],
            }
            rows.append(row)
            print(json.dumps(row), flush=True)
        t = times["icp_step"]
        fl = sum(m_["useful_flops"] for m_ in models.values())
        total = {
            "shape": f"{m}x{n_r}", "stage": "icp_step(total)",
            "measured_us": round(t * 1e6, 1),
            "useful_gflop": round(fl / 1e9, 3),
            "achieved_tflops": round(fl / t / 1e12, 2),
            "pct_raw_peak": round(100 * fl / t / PEAK_BF16, 2),
            "cq_cb": [cq, cb],
        }
        total_rows.append(total)
        print(json.dumps(total), flush=True)

    print("\n| Shape | Stage | Measured (µs) | Useful GFLOP | Achieved "
          "TFLOP/s | % raw bf16 peak | SOL (µs) | SOL attainment | Bound |")
    print("|---|---|---|---|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['shape']} | {r['stage']} | {r['measured_us']} | "
              f"{r['useful_gflop']} | {r['achieved_tflops']} | "
              f"{r['pct_raw_peak']}% | {r['sol_us']} | {r['pct_of_sol']}% | "
              f"{r['bound']} |")
    for r in total_rows:
        print(f"| {r['shape']} | {r['stage']} | {r['measured_us']} | "
              f"{r['useful_gflop']} | {r['achieved_tflops']} | "
              f"{r['pct_raw_peak']}% | — | — | full iteration |")


if __name__ == "__main__":
    main()
