"""Benchmark: photogeometric ICP iteration latency on the flagship workload.

Headline metric (BASELINE.md): ms per ICP iteration at |F| = |M| = 16384
landmarks, |R| = 256 representatives — the reference's ~1.1 ms/iteration on
an AMD R9 270X (reference README.md:8, docs/mainpage.dox).

Method: jit the full registration loop pinned to exactly K iterations
(convergence thresholds 0 so it never stops early — the reference's 40-cap
path), run it end-to-end on device, report wall/K. This charges everything
the reference charges per iteration (transform, RBC search, weights,
reductions, rotation solve) plus our loop overhead, and excludes compile.

Prints ONE JSON line; vs_baseline = reference_ms / ours_ms (>1 means faster
than the reference).
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_MS = 1.1
ITERS = 40


def main() -> None:
    import jax
    import jax.numpy as jnp
    from functools import partial

    from icp_tpu import ICPConfig, ICPParams, register
    from __graft_entry__ import _synthetic_pair

    config = ICPConfig(max_iterations=ITERS)  # m=16384, n_r=256, POWER+WEIGHTED+RBC
    # Zero thresholds -> always run the full ITERS iterations.
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()

    fixed_np, moving_np = _synthetic_pair(config.m)
    fixed = jnp.asarray(fixed_np)
    moving = jnp.asarray(moving_np)

    run = partial(register, params=params, config=config)

    # Warmup / compile.
    state = jax.block_until_ready(run(fixed, moving))
    assert int(state.k) == ITERS, f"expected {ITERS} iterations, got {int(state.k)}"

    reps = 5
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(run(fixed, moving))
        times.append(time.perf_counter() - t0)
    per_iter_ms = (min(times) / ITERS) * 1e3

    print(json.dumps({
        "metric": "icp_iteration_ms_f16384_r256",
        "value": round(per_iter_ms, 4),
        "unit": "ms/iteration",
        "vs_baseline": round(BASELINE_MS / per_iter_ms, 3),
    }))


if __name__ == "__main__":
    main()
