"""Measure while_loop trip overhead and full-registration breakdown on TPU."""

import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(label, fn, *args, reps=3):
    fn_j = jax.jit(fn)
    jax.block_until_ready(fn_j(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn_j(*args))
        ts.append(time.perf_counter() - t0)
    print(f"{label:46s} {min(ts)*1e3:9.2f} ms")


def main():
    from icp_tpu import ICPConfig, ICPParams, register
    from icp_tpu.icp.run import build_index, icp_run
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig(max_iterations=40)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()
    fixed_np, moving_np = _synthetic_pair(config.m)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)

    # Empty while_loop with the same trip count.
    def empty_while(x):
        def cond(c):
            return c[0] < 40
        def body(c):
            return (c[0] + 1, c[1] * 1.0000001)
        return jax.lax.while_loop(cond, body, (jnp.int32(0), x))
    bench("empty while_loop 40 trips", empty_while, jnp.float32(1.0))

    # 40 steps via scan (no convergence check), step fn constant-folded index.
    index = jax.block_until_ready(
        jax.jit(lambda f: build_index(f, params, config))(fixed))

    def scan40(mv):
        def body(st, _):
            return icp_step(st, mv, index, params, config), None
        st, _ = jax.lax.scan(body, identity_state(), None, length=40)
        return st
    bench("40 icp_steps via scan (prebuilt index)", scan40, moving)

    def while40(mv):
        return icp_run(mv, index, params, config)
    bench("icp_run while_loop (prebuilt index)", while40, moving)

    bench("register (index build + while_loop)",
          lambda f, mv: register(f, mv, params, config), fixed, moving)

    # Single step (dispatch-dominated, for reference).
    bench("single icp_step", lambda mv: icp_step(identity_state(), mv, index,
                                                 params, config), moving)


if __name__ == "__main__":
    main()
