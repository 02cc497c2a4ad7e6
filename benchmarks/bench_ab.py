"""In-process A/B of ICPConfig variants on the flagship workload.

The dev chip's throughput drifts ~25% across hours, so comparing two
bench.py runs from different sessions is meaningless (within-window
spread is ~±3%). This tool times every variant back-to-back in ONE
process, interleaved over several rounds, which cancels the drift.

Usage:
    python benchmarks/bench_ab.py field=value [field=value ...] \
        -- field=value ...

Each ``--``-separated group is one variant (overrides on the default
ICPConfig); with no args it times the default config alone. Example:

    python benchmarks/bench_ab.py use_pallas=True -- use_pallas=False
"""

from __future__ import annotations

import dataclasses
import sys
import time


def _parse_variants(argv):
    groups, cur = [], []
    for a in argv:
        if a == "--":
            groups.append(cur)
            cur = []
        else:
            cur.append(a)
    groups.append(cur)

    def coerce(v):
        if v in ("True", "true"):
            return True
        if v in ("False", "false"):
            return False
        try:
            return int(v)
        except ValueError:
            return v

    return [dict((k, coerce(v)) for k, v in (kv.split("=", 1) for kv in g))
            for g in groups]


ITERS_HI, ITERS_LO = 40, 8


def time_config(config, params, fixed, moving, k):
    from icp_tpu import register

    cfg = dataclasses.replace(config, max_iterations=k)
    t0 = time.perf_counter()
    int(register(fixed, moving, params, cfg).k)  # forced host read
    return time.perf_counter() - t0


def main():
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams
    from __graft_entry__ import _synthetic_pair

    variants = _parse_variants(sys.argv[1:])
    configs = [dataclasses.replace(ICPConfig(), **ov) for ov in variants]
    assert len({c.m for c in configs}) == 1, "variants must share m"
    fixed_np, moving_np = _synthetic_pair(configs[0].m)
    fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()
    # Warm/compile every variant first, then interleave measurement rounds
    # so drift within the session hits all variants equally. Min T(hi) and
    # min T(lo) are taken SEPARATELY before differencing — min-of-
    # differences flips negative under dispatch jitter.
    for cfg in configs:
        for k in (ITERS_LO, ITERS_HI):
            time_config(cfg, params, fixed, moving, k)
    rounds = 5
    best = [{ITERS_LO: float("inf"), ITERS_HI: float("inf")}
            for _ in configs]
    for _ in range(rounds):
        for i, cfg in enumerate(configs):
            for k in (ITERS_LO, ITERS_HI):
                best[i][k] = min(best[i][k],
                                 time_config(cfg, params, fixed, moving, k))
    for ov, b in zip(variants, best):
        ms = (b[ITERS_HI] - b[ITERS_LO]) / (ITERS_HI - ITERS_LO) * 1e3
        label = " ".join(f"{k}={v}" for k, v in ov.items()) or "default"
        print(f"{label:48s} {ms:8.4f} ms/iteration")


if __name__ == "__main__":
    main()
