"""Scaling-efficiency harness: registrations/s (~frames/s) vs mesh size.

BASELINE target: >= 80% frames/s scaling efficiency on multi-host pose-graph
runs. This harness measures throughput of the sharded registration at every
power-of-two dp size the available devices allow and reports efficiency
relative to linear scaling from the smallest size. On real hardware run it
on a pod slice; on the CPU backend (--cpu) it exercises the identical
collective program on virtual devices (numbers are then about correctness
of the scaling STRUCTURE, not wall-clock).
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU backend with 8 virtual devices")
    ap.add_argument("--m", type=int, default=16384)
    ap.add_argument("--n-r", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10,
                    help="ICP iterations per registration")
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import os

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8").strip()

    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.sharded import make_sharded_register
    from __graft_entry__ import _synthetic_pair

    n_devices = len(jax.devices())
    config = ICPConfig(m=args.m, n_r=args.n_r, max_iterations=args.iters,
                       estimate_scale=False)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()
    fixed_np, moving_np = _synthetic_pair(args.m)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)

    sizes = []
    d = 1
    while d <= n_devices:
        sizes.append(d)
        d *= 2

    results = {}
    for n_dp in sizes:
        mesh = make_mesh(n_dp, 1)
        run = make_sharded_register(mesh, config)
        state = jax.block_until_ready(run(fixed, moving, params))
        assert int(state.k) == args.iters
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(run(fixed, moving, params))
            ts.append(time.perf_counter() - t0)
        results[n_dp] = min(ts)
        print(f"dp={n_dp:3d}: {min(ts)*1e3:8.2f} ms/registration "
              f"({1.0/min(ts):6.1f} reg/s)")

    base = sizes[0]
    for n_dp in sizes[1:]:
        eff = (results[base] / results[n_dp]) / (n_dp / base)
        print(f"scaling efficiency dp={base}->{n_dp}: {eff*100:.1f}%")

    print(json.dumps({
        "metric": "registrations_per_s",
        "value": round(1.0 / results[sizes[-1]], 2),
        "unit": "reg/s",
        "devices": sizes[-1],
    }))


if __name__ == "__main__":
    main()
