"""Interleaved same-process A/B: hoisted W-matvec moment translation vs
the direct per-term algebra, measured on the FULL icp_step loop (the
isolated-stage profile charges the tail ~0.1 ms, but inside the real loop
XLA may overlap those tiny ops with the next iteration's kernels — this
settles which number is real)."""

import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 120, 24


def main():
    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig()
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(16384)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, config))(fixed))
    index_no_w = index._replace(moment_w=None)

    runners = {}
    for label, idx in (("hoisted W", index), ("direct algebra", index_no_w)):
        @partial(jax.jit, static_argnames=("n",))
        def run(mv, n, idx=idx):
            def body(st, _):
                return icp_step(st, mv, idx, params, config), None
            st, _ = jax.lax.scan(body, identity_state(), None, length=n)
            return st

        def t_of(n, run=run):
            out = run(moving, n)
            float(np.asarray(out.t).ravel()[0])

        for n in (N_HI, N_LO):
            t_of(n)
        runners[label] = t_of

    best = {k: {N_HI: float("inf"), N_LO: float("inf")} for k in runners}
    for _ in range(10):
        for k, t_of in runners.items():
            for n in (N_HI, N_LO):
                t0 = time.perf_counter()
                t_of(n)
                best[k][n] = min(best[k][n], time.perf_counter() - t0)
    for k in runners:
        per = (best[k][N_HI] - best[k][N_LO]) / (N_HI - N_LO) * 1e3
        print(f"{k:20s} {per:8.4f} ms/iteration")


if __name__ == "__main__":
    main()
