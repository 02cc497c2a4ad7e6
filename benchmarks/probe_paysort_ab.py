"""Alternating same-process A/B: payload sort (one variadic sort, no
permute gather) vs key-sort+take, composed into the fused POINT iteration.

    PYTHONPATH=/root/repo:$PYTHONPATH python -u benchmarks/probe_paysort_ab.py [m n_r]
"""

import sys
from functools import partial

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from ab_util import ab_compare  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from icp_tpu.rbc import grouping
    from __graft_entry__ import _synthetic_pair

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n_r = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    config = ICPConfig(m=m, n_r=n_r)
    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(m)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(jax.jit(
        lambda f: build_index(f, params, config))(jnp.asarray(fixed_np)))

    n_hi, n_lo = (40, 8) if m > 65536 else (120, 24)

    def make_run(variant):
        grouping._PAYLOAD_SORT_MIN_ROWS = 0 if variant == "pay" else 1 << 62

        @partial(jax.jit, static_argnames=("n",))
        def run(st, n):
            def body(i, st):
                return icp_step(st, moving, index, params, config)
            return jax.lax.fori_loop(0, n, body, st)

        jax.block_until_ready(run(identity_state(), n_hi))
        jax.block_until_ready(run(identity_state(), n_lo))
        return run

    ab_compare(make_run, ("take", "pay"), identity_state(),
               n_hi=n_hi, n_lo=n_lo, npairs=5, reps=3)


if __name__ == "__main__":
    main()
