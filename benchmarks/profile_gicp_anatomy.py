"""Hardware probe: where does the GICP GN kernel's cost go?

At the flagship shape the fused GN kernel measures ~0.154 ms for "plane"
(1 GN row/pair) but ~0.465 ms for "gicp" (3 rows/pair via a closed-form
Cholesky of the pair's 3x3 Mahalanobis matrix) — far more than 3x the
row-math delta. The VMEM limit is NOT the cause (raised-limit batches
change nothing; benchmarks/probe_vmem_limit.py). This probe compiles
ablated variants of the kernel body to attribute the gap:

  plane      : production plane body (baseline)
  gicp       : production gicp body (full cost)
  gicp-nochol: gicp rows but u_k = fixed unit axes (skips _chol3_inv_rows)
  gicp-1row  : chol computed, but only u3's row accumulated (1 dot_general)
  gicp-m     : chol + 3 rows built, but P sums the raw row PLANES through
               one dot_general on the first row only (isolates the
               stack/relayout cost of building v from scalar planes)

Each variant is a real pallas_call at the production block shape
(bin_batch=16), timed with in-jit scan marginal differencing.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_HI, N_LO = 60, 12
ROUNDS = 6
BB = 16


def _chol3_inv_rows(m11, m21, m22, m31, m32, m33):
    """The ROUND-2 closed-form Cholesky rows this probe's findings
    retired from the production kernel (kept here so the ablation stays
    reproducible): rows of L^{-1} for the SPD 3x3 M = L L^T."""
    import jax.numpy as jnp

    l11 = jnp.sqrt(m11)
    i11 = 1.0 / l11
    l21 = m21 * i11
    l31 = m31 * i11
    l22 = jnp.sqrt(m22 - l21 * l21)
    i22 = 1.0 / l22
    l32 = (m32 - l31 * l21) * i22
    l33 = jnp.sqrt(jnp.maximum(m33 - l31 * l31 - l32 * l32, 1e-12))
    i33 = 1.0 / l33
    u1 = (i11, None, None)
    u2 = (-l21 * i11 * i22, i22, None)
    u3 = ((l21 * l32 - l31 * l22) * (i11 * i22 * i33),
          -l32 * i22 * i33, i33)
    return u1, u2, u3


def main():
    from icp_tpu import ICPConfig, ICPParams, Objective
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.kernels.fused_step import (
        _HI,
        _kernel_compiler_params,
        _search_core,
    )
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
    n_r, cq, d = mg.shape
    cb = index.bins_vals12.shape[1]
    print(f"shapes: n_r={n_r} cq={cq} cb={cb} bb={BB}", flush=True)

    def body(variant, p, nmv, qv, reps_blk, bins_vals, sq_b, g, b, alpha):
        qc, one_hot, w = _search_core(p, qv, reps_blk, bins_vals[..., :8],
                                      sq_b, g, b, alpha, True, "none",
                                      None, in_kernel=True)
        matched = jax.lax.dot_general(one_hot, bins_vals,
                                      (((2,), (1,)), ((0,), (0,))),
                                      precision=_HI)
        mx, my, mz = qc[..., 0], qc[..., 1], qc[..., 2]
        dx = mx - matched[..., 0]
        dy = my - matched[..., 1]
        dz = mz - matched[..., 2]
        nfx, nfy, nfz = matched[..., 8], matched[..., 9], matched[..., 10]
        ones = jnp.ones_like(mx)

        def row_planes(ux, uy, uz):
            jx = my * uz - mz * uy
            jy = mz * ux - mx * uz
            jz = mx * uy - my * ux
            r = dx * ux + dy * uy + dz * uz
            return (ux, uy, uz, jx, jy, jz, r, ones)

        zeros = jnp.zeros_like(mx)
        if variant == "plane":
            rows = [row_planes(nfx, nfy, nfz)]
        elif variant == "gicp-wb2":
            # Candidate round-3+ form: 2 data rows (s, t) + ONE stack-free
            # z-moment z = [m, d, 1, 0] standing in for the 3 constant
            # rows (their sum B B^T is linear in P_z = sum w z z^T; the
            # tiny reassembly runs in XLA outside the kernel). For TIMING
            # the kernel returns P_st + P_z (same compute cost as the
            # real two-output form; parity is not checked here).
            from icp_tpu.kernels.fused_step import _lane_iota

            nmx, nmy, nmz = nmv[..., 0], nmv[..., 1], nmv[..., 2]
            e = 1.0 - 1e-3
            cth = nfx * nmx + nfy * nmy + nfz * nmz
            gs = e / (4.0 * (2.0 - e * (1.0 + cth)))
            gt = e / (4.0 * (2.0 - e * (1.0 - cth)))
            P = jnp.zeros(p.shape[:1] + (8, 8), p.dtype)
            for r, wf in [
                    (row_planes(nfx + nmx, nfy + nmy, nfz + nmz), gs),
                    (row_planes(nfx - nmx, nfy - nmy, nfz - nmz), gt)]:
                v = jnp.stack(r, axis=-1)
                P = P + jax.lax.dot_general(
                    v * (w * wf)[..., None], v,
                    (((1,), (1,)), ((0,), (0,))), precision=_HI)
            # z = m in lanes 0:3, d in lanes 3:6, 1 in lane 6 — all lane
            # ops: mask + one constant shift matmul + iota select.
            lane = _lane_iota((1, 1, 8), 2)
            mask03 = (lane < 3).astype(p.dtype)
            shift03_36 = (
                (_lane_iota((8, 8), 1) == _lane_iota((8, 8), 0) + 3)
                & (_lane_iota((8, 8), 0) < 3)).astype(p.dtype)
            dfull = (qc - matched[..., :8]) * mask03
            z = (qc * mask03
                 + jax.lax.dot_general(dfull, shift03_36,
                                       (((2,), (0,)), ((), ())),
                                       precision=_HI)
                 + (lane == 6).astype(p.dtype))
            P_z = jax.lax.dot_general(z * w[..., None], z,
                                      (((1,), (1,)), ((0,), (0,))),
                                      precision=_HI)
            return P + P_z
        elif variant == "gicp-wb":
            # The round-3 production decomposition (Woodbury; see
            # kernels/fused_gn.py): 3 constant rows at w/2 + 2 data rows.
            nmx, nmy, nmz = nmv[..., 0], nmv[..., 1], nmv[..., 2]
            e = 1.0 - 1e-3
            cth = nfx * nmx + nfy * nmy + nfz * nmz
            gs = e / (4.0 * (2.0 - e * (1.0 + cth)))
            gt = e / (4.0 * (2.0 - e * (1.0 - cth)))
            pairs = [(row_planes(ones, zeros, zeros), 0.5),
                     (row_planes(zeros, ones, zeros), 0.5),
                     (row_planes(zeros, zeros, ones), 0.5),
                     (row_planes(nfx + nmx, nfy + nmy, nfz + nmz), gs),
                     (row_planes(nfx - nmx, nfy - nmy, nfz - nmz), gt)]
            P = jnp.zeros(p.shape[:1] + (8, 8), p.dtype)
            for r, wf in pairs:
                v = jnp.stack(r, axis=-1)
                P = P + jax.lax.dot_general(
                    v * (w * wf)[..., None], v,
                    (((1,), (1,)), ((0,), (0,))), precision=_HI)
            return P
        else:
            nmx, nmy, nmz = nmv[..., 0], nmv[..., 1], nmv[..., 2]
            if variant == "gicp-nochol":
                u1 = (ones, None, None)
                u2 = (zeros, ones, None)
                u3 = (zeros, zeros, ones)
            else:
                e = 1.0 - 1e-3
                m11 = 2.0 - e * (nfx * nfx + nmx * nmx)
                m21 = -e * (nfx * nfy + nmx * nmy)
                m22 = 2.0 - e * (nfy * nfy + nmy * nmy)
                m31 = -e * (nfx * nfz + nmx * nmz)
                m32 = -e * (nfy * nfz + nmy * nmz)
                m33 = 2.0 - e * (nfz * nfz + nmz * nmz)
                u1, u2, u3 = _chol3_inv_rows(m11, m21, m22, m31, m32, m33)
            if variant == "gicp-1row":
                rows = [row_planes(u3[0], u3[1], u3[2])]
            else:
                rows = [row_planes(u1[0], zeros, zeros),
                        row_planes(u2[0], u2[1], zeros),
                        row_planes(u3[0], u3[1], u3[2])]
        if variant == "gicp-m":
            # rows built (kept live via a cheap plane-sum) but only ONE
            # stack + dot_general:
            extra = sum(sum(x for x in r if x is not None) for r in rows[1:])
            v = jnp.stack(rows[0], axis=-1)
            v = v + extra[..., None] * 1e-30
            return jax.lax.dot_general(v * w[..., None], v,
                                       (((1,), (1,)), ((0,), (0,))),
                                       precision=_HI)
        P = jnp.zeros(p.shape[:1] + (8, 8), p.dtype)
        for r in rows:
            v = jnp.stack(r, axis=-1)
            P = P + jax.lax.dot_general(v * w[..., None], v,
                                        (((1,), (1,)), ((0,), (0,))),
                                        precision=_HI)
        return P

    def make_call(variant):
        def kernel(p_ref, nm_ref, qv_ref, reps_ref, vals_ref, sq_b_ref,
                   g_ref, b_ref, scal_ref, out_ref):
            out_ref[:] = body(variant, p_ref[:], nm_ref[:], qv_ref[:],
                              reps_ref[:], vals_ref[:], sq_b_ref[:],
                              g_ref[:], b_ref[:], scal_ref[0, 0])

        def i3(i):
            return (i, 0, 0)

        def i2(i):
            return (i, 0)

        def full2(i):
            return (0, 0)

        dv = index.bins_vals12.shape[2]
        scal_arr = jnp.asarray(params.alpha).reshape(1, 1)

        @jax.jit
        def call(x):
            return pl.pallas_call(
                kernel,
                compiler_params=_kernel_compiler_params(),
                grid=(n_r // BB,),
                in_specs=[
                    pl.BlockSpec((BB, cq, d), i3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, cq, 3), i3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, cq), i2, memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, d), i2, memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, cb, dv), i3, memory_space=pltpu.VMEM),
                    pl.BlockSpec((BB, cb), i2, memory_space=pltpu.VMEM),
                    pl.BlockSpec((d, d), full2, memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, d), full2, memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.SMEM),
                ],
                out_specs=pl.BlockSpec((BB, d, d), i3,
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((n_r, d, d), jnp.float32),
            )(x, nm, qvalid, index.reps, index.bins_vals12,
              index.sq_b_masked, G, b_row, scal_arr)

        return call

    variants = ("plane", "gicp", "gicp-wb", "gicp-wb2")
    calls = {}
    for v in variants:
        try:
            c = make_call(v)
            jax.block_until_ready(c(mg))
            calls[v] = c
            print(f"  {v:12s} compiles ok", flush=True)
        except Exception as e:  # noqa: BLE001 - probe
            print(f"  {v:12s} FAIL {str(e).splitlines()[0][:100]}",
                  flush=True)

    def make_runner(v):
        call = calls[v]

        @partial(jax.jit, static_argnames=("n",))
        def run(mg0, n):
            def step(c, _):
                P = call(c)
                return c + P[0, 0, 0] * 1e-30, None
            c, _ = jax.lax.scan(step, mg0, None, length=n)
            return c

        def t_of(n):
            t0 = time.perf_counter()
            out = run(mg, n)
            float(np.asarray(out).ravel()[0])
            return time.perf_counter() - t0

        for n in (N_HI, N_LO):
            t_of(n)
        return t_of

    runners = {v: make_runner(v) for v in calls}
    best = {v: {N_HI: float("inf"), N_LO: float("inf")} for v in runners}
    for _ in range(ROUNDS):
        for v, t_of in runners.items():
            for n in (N_HI, N_LO):
                best[v][n] = min(best[v][n], t_of(n))
    for v in runners:
        ms = (best[v][N_HI] - best[v][N_LO]) / (N_HI - N_LO) * 1e3
        print(f"{v:12s} {ms:.4f} ms/kernel", flush=True)


if __name__ == "__main__":
    main()
