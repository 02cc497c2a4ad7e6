"""Per-op latency table against the reference's per-kernel µs rows.

The reference records per-kernel latencies in its unit tests
(reference tests/testsICP.cpp:93,174,266,358,642,1027 — mirrored in
BASELINE.md). This script times the corresponding TPU ops with the
loop-inside-one-dispatch method (the axon tunnel adds ~25 ms per dispatch,
so each op is iterated N times inside a jitted ``lax.fori_loop`` with a
data dependency; per-op time = (loop - empty_loop) / N) and REGENERATES
``docs/PERF_TABLE.md`` so regressions are visible in the diff.

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


def timed_us(make_body, carry_init, n=N_LOOP, reps=4, base_us=0.0):
    @jax.jit
    def run(carry):
        return jax.lax.fori_loop(0, n, make_body(), carry)

    jax.block_until_ready(run(carry_init))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(carry_init))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e6 / n - base_us


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

    base = timed_us(lambda: (lambda i, c: c + 1.0), jnp.float32(0))
    rows = []

    def add(name, ref_us, make_body, carry, **kw):
        us = timed_us(make_body, carry, base_us=base, **kw)
        rows.append((name, ref_us, us))
        print(f"{name:40s} ref {ref_us or '':>6} us   ours {us:8.2f} us")

    # -- the reference's per-kernel rows (testsICP.cpp) --------------------
    def lms_body():
        def body(i, c):
            lm = get_landmarks(c.reshape(-1, 8))
            return c + jnp.mean(lm) * 1e-20
        return body
    add("getLMs (640x480 -> 16384)", "13", lms_body, cloud)

    def reps_body():
        def body(i, lm):
            r = get_representatives(lm, n_ry, n_rx)
            return lm + jnp.mean(r) * 1e-20
        return body
    add("getReps (16384 -> 256)", "7", reps_body, moving)

    dists = jnp.abs(moving[:, 2])
    def weights_body():
        def body(i, d):
            w = moments.compute_weights(d)
            s = moments.masked_weight_sum(w)
            return d * (1.0 + s * 1e-30)
        return body
    add("icpComputeReduceWeights+sum (16384)", "13", weights_body, dists)

    w = moments.compute_weights(dists)
    sw = moments.masked_weight_sum(w)
    def mean_body():
        def body(i, mv):
            mf, mm = moments.centroids(fixed, mv, w, sw)
            return mv + (mf[0] + mm[0]) * 1e-20
        return body
    add("icpMean_Weighted (fused F/M)", "20", mean_body, moving)

    mf0, mm0 = moments.centroids(fixed, moving, w, sw)
    def sij_body():
        def body(i, mv):
            dm = moments.deviations(mv, mm0)
            df = moments.deviations(fixed, mf0)
            S = moments.s_matrix(dm, df, params.c, w)
            return mv + S[0] * 1e-20
        return body
    add("icpSubtractMean+icpSijProducts+reduce", "20", sij_body, moving)

    S9 = jnp.asarray(
        np.random.default_rng(1).normal(size=9).astype(np.float32) * 1e-3)
    def power_body():
        def body(i, s):
            q = horn.solve_rotation_power(s)
            return s + q[0] * 1e-20
        return body
    add("icpPowerMethod (rotation solve)", "27", power_body, S9)

    def tf_body():
        def body(i, mv):
            return transform_points(mv, qidentity(), jnp.zeros(3),
                                    jnp.float32(1.0))
        return body
    add("icpTransform (16384x8)", "", tf_body, moving)

    # -- TPU pipeline stages (no reference counterpart row) ----------------
    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)

    if use_pallas:
        def assign_body():
            def body(i, mv):
                rid = rep_assign_pallas(mv, C, srow)
                return mv + (rid[0] * 1e-20).astype(mv.dtype)
            return body
        add("fused transform+rep-assign (Pallas)", "", assign_body, moving)

    rep_ids = jnp.asarray(np.random.default_rng(0).integers(
        0, 256, 16384, dtype=np.int32))
    def group_body():
        def body(i, mv):
            gl = group_rows_by_bin(rep_ids, 256, config.query_capacity, (mv,))
            return mv * (1.0 + gl.grouped[0][0, 0, 0] * 1e-30)
        return body
    add("grouping (payload sort, 16384->256)", "", group_body, moving)

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
        add("fused bin search+weights+moments (Pallas)", "", mom_body, mg)

    def step_body():
        def body(i, st):
            return icp_step(st, moving, index, params, config)
        return body
    add("icp_step (FULL fused iteration)", "~1100", step_body,
        identity_state(), n=100)

    ref_total = 1100.0
    ours_total = rows[-1][2]

    with open(OUT, "w") as f:
        f.write(
            "# Per-op latency table\n\n"
            f"Backend: **{backend}** (v5e via axon tunnel when tpu). "
            "Method: N-iteration jitted fori_loop with data dependencies, "
            "empty-loop baseline subtracted (see "
            "benchmarks/profile_optable.py; regenerate with it — do not "
            "hand-edit). Reference rows: per-kernel latency comments in "
            "the reference's tests (testsICP.cpp:93,174,266,358,642,1027; "
            "AMD R9 270X), mirrored in BASELINE.md.\n\n"
            "| Op | Reference (µs) | icp_tpu (µs) |\n|---|---|---|\n")
        for name, ref_us, us in rows:
            f.write(f"| {name} | {ref_us or '—'} | {us:.1f} |\n")
        f.write(
            f"\nFull iteration: reference ~{ref_total:.0f} µs vs "
            f"**{ours_total:.1f} µs** ({ref_total / ours_total:.2f}x). "
            "Individual ops can read slower than the reference's dedicated "
            "kernels (XLA materializes intermediate tensors when an op is "
            "timed in isolation that the fused iteration never allocates); "
            "the iteration row is the meaningful comparison, and the fused "
            "Pallas rows show where it goes.\n")
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
