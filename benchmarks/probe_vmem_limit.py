"""Hardware probe: raised Mosaic scoped-VMEM limit vs the 16 MB default.

Mosaic rejects kernels whose stack exceeds the default scoped-VMEM limit
(~16 MB); that limit is what forces gicp to bin_batch=8 and POINT/plane
to 16-32 (fused_step._auto_bin_batch / fused_gn._auto_bin_batch_gn). If
the physical VMEM of the target chip is larger, raising
``pltpu.CompilerParams(vmem_limit_bytes=...)`` per-kernel may admit the
bigger batches directly — far cheaper than restructuring the kernels.

This probe, per (kernel, mode, bin_batch, limit): (1) compiles on the
real chip, (2) checks parity vs the XLA twin, (3) times the kernel with
in-jit scan marginal differencing (the tunnel RTT swamps single calls).

Run on the real chip (no env override), AFTER any bench has finished.
"""
from __future__ import annotations

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 60, 12
ROUNDS = 6
MB = 1024 * 1024


def main():
    from icp_tpu import ICPConfig, ICPParams, Objective
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.kernels import fused_gn, fused_step
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
    print(f"shapes: n_r={n_r} cq={cq} cb={cb}", flush=True)

    def gn_call(mode, bb, limit, x):
        return fused_gn.bin_gn_moments_pallas(
            x, None if mode == "plane" else nm, qvalid, index.reps,
            index.bins_vals12, index.sq_b_masked, G, b_row, params.alpha,
            mode=mode, weighted=True, gicp_eps=1e-3, bin_batch=bb,
            vmem_limit_bytes=limit)

    def point_call(mode, bb, limit, x):
        return fused_step.bin_point_moments_pallas(
            x, qvalid, index.reps, index.bins_vals12[..., :8],
            index.sq_b_masked, G, b_row, params.alpha,
            weighted=True, bin_batch=bb, vmem_limit_bytes=limit)

    refs = {}

    def ref_of(kind, mode):
        if (kind, mode) not in refs:
            if kind == "gn":
                r = fused_gn.bin_gn_moments_ref(
                    mg, None if mode == "plane" else nm, qvalid, index.reps,
                    index.bins_vals12, index.sq_b_masked, G, b_row,
                    params.alpha, mode=mode, weighted=True, gicp_eps=1e-3)
            else:
                r = fused_step.bin_point_moments_ref(
                    mg, qvalid, index.reps, index.bins_vals12[..., :8],
                    index.sq_b_masked, G, b_row, params.alpha, weighted=True)
            refs[(kind, mode)] = np.asarray(jax.block_until_ready(r))
        return refs[(kind, mode)]

    cases = [
        # (kind, mode, bb, vmem_limit_bytes)
        ("gn", "gicp", 8, 0),          # current production anchor
        ("gn", "gicp", 16, 64 * MB),
        ("gn", "gicp", 32, 100 * MB),
        ("gn", "plane", 16, 0),        # current production anchor
        ("gn", "plane", 32, 64 * MB),
        ("gn", "plane_sym", 32, 64 * MB),
        ("point", "point", 32, 0),     # current production anchor
        ("point", "point", 64, 64 * MB),
        ("point", "point", 128, 100 * MB),
    ]
    ok_cases = []
    for kind, mode, bb, limit in cases:
        call = gn_call if kind == "gn" else point_call
        try:
            out = np.asarray(jax.block_until_ready(
                call(mode, bb, limit, mg)))
        except Exception as e:  # noqa: BLE001 - probing the compile limit
            msg = str(e).split("\n")[0][:100]
            print(f"  {kind}:{mode:10s} bb={bb:3d} lim={limit // MB:3d}MB "
                  f"FAIL {msg}", flush=True)
            continue
        ref = ref_of(kind, mode)
        err = np.abs(out - ref).max() / max(1.0, np.abs(ref).max())
        print(f"  {kind}:{mode:10s} bb={bb:3d} lim={limit // MB:3d}MB ok  "
              f"rel_err={err:.2e}", flush=True)
        ok_cases.append((kind, mode, bb, limit))

    def make_runner(kind, mode, bb, limit):
        call = gn_call if kind == "gn" else point_call

        @partial(jax.jit, static_argnames=("n",))
        def run(mg0, n):
            def body(c, _):
                P = call(mode, bb, limit, c)
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

    runners = {c: make_runner(*c) for c in ok_cases}
    best = {c: {N_HI: float("inf"), N_LO: float("inf")} for c in ok_cases}
    for _ in range(ROUNDS):
        for c, t_of in runners.items():
            for n in (N_HI, N_LO):
                best[c][n] = min(best[c][n], t_of(n))
    for c in ok_cases:
        kind, mode, bb, limit = c
        ms = (best[c][N_HI] - best[c][N_LO]) / (N_HI - N_LO) * 1e3
        print(f"{kind}:{mode:10s} bb={bb:3d} lim={limit // MB:3d}MB "
              f"{ms:.4f} ms/kernel", flush=True)


if __name__ == "__main__":
    main()
