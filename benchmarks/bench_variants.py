"""A/B benchmark of step variants on the current backend (40-step scans;
marginal cost via the shared dispatch overhead being constant)."""

import time

import jax
import jax.numpy as jnp


def bench(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:48s} {min(ts)*1e3:9.2f} ms")


def main():
    import dataclasses

    from icp_tpu import Correspondence, ICPConfig, ICPParams
    from icp_tpu.icp.run import build_index
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from __graft_entry__ import _synthetic_pair

    params = ICPParams(alpha=2e2).as_f32()
    fixed_np, moving_np = _synthetic_pair(16384)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)

    base = ICPConfig()
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, base))(fixed))

    def scan40(config):
        def run(mv):
            def body(st, _):
                return icp_step(st, mv, index, params, config), None
            st, _ = jax.lax.scan(body, identity_state(), None, length=40)
            return st
        return run

    bench("40 steps, XLA grouped search", scan40(base), moving)
    bench("40 steps, Pallas bin search",
          scan40(dataclasses.replace(base, use_pallas=True)), moving)
    bench("40 steps, SVD rotation",
          scan40(dataclasses.replace(
              base, rotation=__import__("icp_tpu").RotationMode.SVD)), moving)
    bench("40 steps, regular (unweighted)",
          scan40(dataclasses.replace(
              base, weighting=__import__("icp_tpu").Weighting.REGULAR)),
          moving)
    bench("40 steps, brute-force NN",
          scan40(dataclasses.replace(
              base, correspondence=Correspondence.BRUTE)), moving)

    # Dispatch floor for interpreting the numbers.
    bench("empty (dispatch floor)", lambda x: x + 1.0, jnp.float32(0))


if __name__ == "__main__":
    main()
