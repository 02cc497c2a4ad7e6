"""Per-iteration cost of each objective at the flagship shape (interleaved
A/B, marginal loop differencing — see bench.py for the methodology notes).

POINT rides the fused two-pass pipeline; PLANE/GICP currently take the
grouped-search path with materialized per-point tables. This script sizes
that gap (the motivation for a fused PLANE/GICP moment kernel).
"""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 120, 24


def make_runner(config, params, index, moving, mnormals):
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step

    @partial(jax.jit, static_argnames=("n",))
    def run(mv, n):
        def body(st, _):
            return icp_step(st, mv, index, params, config,
                            moving_normals=mnormals), None
        st, _ = jax.lax.scan(body, identity_state(), None, length=n)
        return st

    def t_of(n):
        out = run(moving, n)
        float(np.asarray(out.t).ravel()[0])  # force host read

    for n in (N_HI, N_LO):
        t_of(n)  # compile
    return t_of


def main():
    import dataclasses

    from icp_tpu import ICPConfig, ICPParams, Objective, Weighting
    from icp_tpu.icp.run import build_index
    from icp_tpu.ops.normals import normals_for
    from __graft_entry__ import _synthetic_pair

    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(16384)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)

    base = ICPConfig(estimate_scale=False)
    variants = {
        "POINT (fused)": dataclasses.replace(base),
        "POINT regular": dataclasses.replace(base,
                                             weighting=Weighting.REGULAR),
        "PLANE (fused)": dataclasses.replace(base,
                                             objective=Objective.PLANE),
        "PLANE (grouped)": dataclasses.replace(
            base, objective=Objective.PLANE, fused_gn=False),
        "GICP (fused)": dataclasses.replace(base, objective=Objective.GICP),
        "GICP (grouped)": dataclasses.replace(
            base, objective=Objective.GICP, fused_gn=False),
    }
    pcfg = variants["PLANE (fused)"]
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, pcfg))(fixed))
    mnormals = jax.block_until_ready(
        jax.jit(lambda m: normals_for(m, pcfg.normal_mode))(moving))

    runners = {
        k: make_runner(cfg, params, index,
                       moving, mnormals if cfg.objective.value != "point"
                       else None)
        for k, cfg in variants.items()
    }

    best = {k: {N_HI: float("inf"), N_LO: float("inf")} for k in runners}
    for _ in range(8):  # interleave variants within each round
        for k, t_of in runners.items():
            for n in (N_HI, N_LO):
                t0 = time.perf_counter()
                t_of(n)
                dt = time.perf_counter() - t0
                best[k][n] = min(best[k][n], dt)

    for k in runners:
        per = (best[k][N_HI] - best[k][N_LO]) / (N_HI - N_LO) * 1e3
        print(f"{k:24s} {per:8.4f} ms/iteration")


if __name__ == "__main__":
    main()
