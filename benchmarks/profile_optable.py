"""Per-op latency table against the reference's per-kernel µs rows.

The reference records per-kernel latencies in its unit tests
(reference tests/testsICP.cpp:93,174,266,358,642,1027 — mirrored in
BASELINE.md). This script times the corresponding TPU ops with the
loop-inside-one-dispatch method (the axon tunnel adds ~25 ms per dispatch,
so each op is iterated inside a jitted ``lax.fori_loop`` with a data
dependency; per-op time = the slope between a long and a short loop of the
same body) and REGENERATES ``docs/PERF_TABLE.md`` so regressions are
visible in the diff.

Usage (on the TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_optable.py
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

N_LOOP = 200
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "docs", "PERF_TABLE.md")


def timed_us(make_body, carry_init, n=N_LOOP, reps=6, base_us=0.0):
    """Per-op µs via MARGINAL differencing: slope between an n-iteration
    and an n/5-iteration fori_loop of the same body. Unlike subtracting a
    separately-measured empty loop (the previous method), the slope
    cancels the dispatch/tunnel constant with the op's own measurements —
    the empty-loop baseline drifts ±20 µs between measurements on the
    tunneled chip and produced negative per-op values. ``base_us`` kept
    for signature compatibility (unused)."""
    del base_us
    import functools
    import statistics

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(carry, k):
        return jax.lax.fori_loop(0, k, make_body(), carry)

    n_lo = max(n // 5, 1)
    for k in (n, n_lo):  # compile
        jax.block_until_ready(run(carry_init, k))

    # Two defenses against the tunnel's ±20 ms per-dispatch jitter:
    # loop lengths are sized per-op so device work >> jitter, and hi/lo
    # dispatches are INTERLEAVED per round with the per-round slopes
    # reduced by median (sequential hi-then-lo produced negative values
    # whenever the chip sped up mid-measurement).
    slopes = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry_init, n))
        t1 = time.perf_counter()
        jax.block_until_ready(run(carry_init, n_lo))
        t2 = time.perf_counter()
        slopes.append(((t1 - t0) - (t2 - t1)) / (n - n_lo) * 1e6)
    return statistics.median(slopes)


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp import horn
    from icp_tpu.icp.quaternion import qidentity, transform_points
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from icp_tpu.kernels.fused_step import (
        bin_point_moments_pallas,
        prep_rep_assign,
        prep_similarity,
        rep_assign_counts_pallas,
        rep_assign_pallas,
    )
    from icp_tpu.ops import moments
    from icp_tpu.ops.sampling import get_landmarks, get_representatives
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from __graft_entry__ import _synthetic_pair

    backend = jax.default_backend()
    config = ICPConfig()
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(config.m)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, config))(fixed))
    cloud = jnp.asarray(
        np.random.default_rng(0).normal(size=(480, 640, 8)).astype(np.float32))
    n_ry, n_rx = config.rep_grid
    use_pallas = backend == "tpu"

    rows = []

    def add(name, ref_us, make_body, carry, **kw):
        us = timed_us(make_body, carry, **kw)
        # Ops cheaper than the loop-slope measurement noise can come out
        # slightly negative — reported as < 1 us, not a negative number.
        rows.append((name, ref_us, us))
        print(f"{name:40s} ref {ref_us or '':>6} us   ours {us:8.2f} us")

    # -- the reference's per-kernel rows (testsICP.cpp) --------------------
    def lms_body():
        def body(i, c):
            lm = get_landmarks(c.reshape(-1, 8))
            return c + jnp.mean(lm) * 1e-20
        return body
    add("getLMs (640x480 -> 16384)", "13", lms_body, cloud, n=2000)

    def reps_body():
        def body(i, lm):
            r = get_representatives(lm, n_ry, n_rx)
            return lm + jnp.mean(r) * 1e-20
        return body
    add("getReps (16384 -> 256)", "7", reps_body, moving, n=20000)

    dists = jnp.abs(moving[:, 2])
    def weights_body():
        def body(i, d):
            w = moments.compute_weights(d)
            s = moments.masked_weight_sum(w)
            return d * (1.0 + s * 1e-30)
        return body
    add("icpComputeReduceWeights+sum (16384)", "13", weights_body, dists, n=20000)

    w = moments.compute_weights(dists)
    sw = moments.masked_weight_sum(w)
    def mean_body():
        def body(i, mv):
            mf, mm = moments.centroids(fixed, mv, w, sw)
            return mv + (mf[0] + mm[0]) * 1e-20
        return body
    add("icpMean_Weighted (fused F/M)", "20", mean_body, moving, n=20000)

    mf0, mm0 = moments.centroids(fixed, moving, w, sw)
    def sij_body():
        def body(i, mv):
            dm = moments.deviations(mv, mm0)
            df = moments.deviations(fixed, mf0)
            S = moments.s_matrix(dm, df, params.c, w)
            return mv + S[0] * 1e-20
        return body
    add("icpSubtractMean+icpSijProducts+reduce", "20", sij_body, moving, n=20000)

    S9 = jnp.asarray(
        np.random.default_rng(1).normal(size=9).astype(np.float32) * 1e-3)
    def power_body():
        def body(i, s):
            q = horn.solve_rotation_power(s)
            return s + q[0] * 1e-20
        return body
    add("icpPowerMethod (rotation solve)", "27", power_body, S9, n=20000)

    def tf_body():
        def body(i, mv):
            return transform_points(mv, qidentity(), jnp.zeros(3),
                                    jnp.float32(1.0))
        return body
    add("icpTransform (16384x8)", "", tf_body, moving, n=20000)

    # -- TPU pipeline stages (no reference counterpart row) ----------------
    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)

    if use_pallas:
        def assign_body():
            def body(i, mv):
                rid = rep_assign_pallas(mv, C, srow)
                return mv + (rid[0] * 1e-20).astype(mv.dtype)
            return body
        add("fused transform+rep-assign (Pallas)", "", assign_body, moving, n=2000)

        def assignc_body():
            def body(i, mv):
                rid, cnt = rep_assign_counts_pallas(mv, C, srow)
                return mv + ((rid[0] + cnt[0]) * 1e-20).astype(mv.dtype)
            return body
        add("fused transform+rep-assign+counts (Pallas)", "", assignc_body,
            moving, n=2000)

    rep_ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, 16384, dtype=np.int32))
    rep_counts = jnp.sum(
        (rep_ids[None, :] == jnp.arange(256, dtype=jnp.int32)[:, None])
        .astype(jnp.int32), axis=1)
    def group_body():
        # Production round-4 grouping: kernel-supplied counts + the Pallas
        # dynamic-slice table build (sort + row gather + table).
        def body(i, mv):
            gl = group_rows_by_bin(rep_ids, 256, config.query_capacity,
                                   (mv,), use_pallas=use_pallas,
                                   counts=rep_counts)
            return mv * (1.0 + gl.grouped[0][0, 0, 0] * 1e-30)
        return body
    add("grouping (sort+permute+table, 16384->256)", "", group_body, moving,
        n=2000)

    gl = group_rows_by_bin(rep_ids, 256, config.query_capacity, (moving,))
    mg = gl.grouped[0]
    qvalid = gl.valid.astype(jnp.float32)
    if use_pallas:
        def mom_body():
            def body(i, m_):
                P = bin_point_moments_pallas(
                    m_, qvalid, index.reps, index.bins_centered,
                    index.sq_b_masked, G, b_row, params.alpha, weighted=True)
                return m_ * (1.0 + P[0, 0, 0] * 1e-30)
            return body
        add("fused bin search+weights+moments (Pallas)", "", mom_body, mg, n=2000)

        from icp_tpu import Objective
        from icp_tpu.kernels.fused_gn import bin_gn_moments_pallas
        from icp_tpu.ops.normals import normals_for

        # POINT's index carries no normals; the GN kernels read the
        # 12-lane bins_vals table a normal-consuming config builds.
        gn_config = ICPConfig(objective=Objective.GICP, estimate_scale=False)
        gn_index = jax.block_until_ready(
            jax.jit(lambda f: build_index(f, params, gn_config))(fixed))
        nm = normals_for(moving, gn_config.normal_mode)
        nm_g = group_rows_by_bin(rep_ids, 256, config.query_capacity,
                                 (nm,)).grouped[0]

        def gn_plane_body():
            def body(i, m_):
                P = bin_gn_moments_pallas(
                    m_, None, qvalid, gn_index.reps, gn_index.bins_vals12,
                    gn_index.sq_b_masked, G, b_row, params.alpha,
                    mode="plane", weighted=True)
                return m_ * (1.0 + P[0, 0, 0] * 1e-30)
            return body
        add("fused GN search+moments, PLANE (Pallas)", "", gn_plane_body,
            mg, n=2000)

        def gn_gicp_body():
            def body(i, m_):
                P, P_z = bin_gn_moments_pallas(
                    m_, nm_g, qvalid, gn_index.reps, gn_index.bins_vals12,
                    gn_index.sq_b_masked, G, b_row, params.alpha,
                    mode="gicp", weighted=True,
                    gicp_eps=params.gicp_epsilon)
                return m_ * (1.0 + (P[0, 0, 0] + P_z[0, 0, 0]) * 1e-30)
            return body
        add("fused GN search+moments, GICP (Pallas)", "", gn_gicp_body,
            mg, n=2000)

    def step_body():
        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return body
    add("icp_step (FULL fused iteration)", "~1100", step_body,
        identity_state(), n=400)

    ref_total = 1100.0
    ours_total = rows[-1][2]

    with open(OUT, "w") as f:
        f.write(
            "# Per-op latency table\n\n"
            f"Backend: **{backend}** (v5e via axon tunnel when tpu). "
            "Method: per-op slope between long/short jitted fori_loops "
            "with data dependencies, "
            "marginal loop-length differencing (see "
            "benchmarks/profile_optable.py; regenerate with it — do not "
            "hand-edit). Reference rows: per-kernel latency comments in "
            "the reference's tests (testsICP.cpp:93,174,266,358,642,1027; "
            "AMD R9 270X), mirrored in BASELINE.md.\n\n"
            "| Op | Reference (µs) | icp_tpu (µs) |\n|---|---|---|\n")
        for name, ref_us, us in rows:
            shown = f"{us:.1f}" if us >= 1.0 else "<1 (sub-noise)"
            f.write(f"| {name} | {ref_us or '—'} | {shown} |\n")
        f.write(
            f"\nFull iteration: reference ~{ref_total:.0f} µs vs "
            f"**{ours_total:.1f} µs** ({ref_total / ours_total:.2f}x). "
            "Individual ops can read slower than the reference's dedicated "
            "kernels (XLA materializes intermediate tensors when an op is "
            "timed in isolation that the fused iteration never allocates); "
            "the iteration row is the meaningful comparison, and the fused "
            "Pallas rows show where it goes. getLMs was the one row "
            "genuinely losing to the reference's GPU kernel (a 128x128 "
            "sample of a 640x480 image is 16384 scattered 32 B reads, "
            "which GPU thread-coalescing hides and a TPU strided slice "
            "cannot — measured 103 us); round 3 replaced the column "
            "stride with an exact one-hot MXU contraction (row stride "
            "stays a major-dim slice), bit-identical output (captures "
            "since: 24.1 then 8.0 us — chip-window dependent, both sides "
            "of the reference's 13; once per frame either way).\n\n"
            "GICP's GN kernel carries TWO anisotropic data rows (the "
            "Woodbury split's s/t directions) plus the z-moment second "
            "output vs PLANE's one row — the GICP-PLANE kernel gap IS "
            "that extra row stack + contraction. The alternatives are "
            "measured dead ends: collapsing both rows into one "
            "contraction ('rowcat') is +1.2% composed (alternating A/B, "
            "benchmarks/profile_gicp_ab2.py, median of 5 pairwise deltas, "
            "every pair negative), the 'lane' layout OOMs at production "
            "shapes, and the round-2 closed-form Cholesky cost +0.13 ms "
            "in serial sqrt/divides. The two-row cost is the floor of "
            "the exact anisotropic objective on this hardware; bin_batch "
            "16 vs 32 and rep-assign block_m 2048/4096/8192 are likewise "
            "measured washes (benchmarks/probe_assign_ab.py).\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
