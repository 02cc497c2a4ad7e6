"""Interleaved A/B of the grouping counts paths (dense equality-reduce vs
searchsorted-over-sorted-keys) inside the REAL iteration at a given shape.

The flag `grouping._LAYOUT_COUNTS_SORTED` is a trace-time constant, so the
two variants are AOT-compiled (register.lower(...).compile()) under
different monkeypatched values, then timed interleaved with marginal
differencing so chip drift cancels (see bench_ab.py for the discipline).

Measured on the v5e (min of 6 interleaved rounds):
  16384x256   dense 0.4093  sparse 0.3797  (-7.2%)
  65536x1024  dense 1.7238  sparse 1.6546  (-4.0%)
=> bin_sort_layout defaults to the sorted/searchsorted counts path.

    PYTHONPATH=/root/repo:$PYTHONPATH python benchmarks/profile_counts.py 65536x1024
"""

from __future__ import annotations

import dataclasses
import sys
import time

N_HI, N_LO = 60, 12


def main():
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.run import register
    from icp_tpu.rbc import grouping
    from __graft_entry__ import _synthetic_pair

    shape = sys.argv[1] if len(sys.argv) > 1 else "65536x1024"
    m, n_r = (int(x) for x in shape.split("x"))
    config = ICPConfig(m=m, n_r=n_r)
    fixed_np, moving_np = _synthetic_pair(m)
    fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()

    variants = {"dense": False, "sparse": True}
    compiled = {}  # label -> {k: compiled executable}
    for label, sorted_counts in variants.items():
        grouping._LAYOUT_COUNTS_SORTED = sorted_counts
        compiled[label] = {}
        for k in (N_LO, N_HI):
            cfg = dataclasses.replace(config, max_iterations=k)
            exe = register.lower(fixed, moving, params, cfg).compile()
            exe(fixed, moving, params)  # warm
            compiled[label][k] = exe
        print(f"compiled {label}", flush=True)

    def run_once(exe):
        t0 = time.perf_counter()
        int(exe(fixed, moving, params).k)  # forced host read
        return time.perf_counter() - t0

    best = {lab: {N_LO: float("inf"), N_HI: float("inf")} for lab in variants}
    for _ in range(6):
        for lab in variants:
            for k in (N_LO, N_HI):
                best[lab][k] = min(best[lab][k], run_once(compiled[lab][k]))

    ms = {}
    for lab in variants:
        ms[lab] = (best[lab][N_HI] - best[lab][N_LO]) / (N_HI - N_LO) * 1e3
        print(f"{lab:8s} {ms[lab]:8.4f} ms/iteration", flush=True)
    d, s = ms["dense"], ms["sparse"]
    print(f"sparse - dense = {s - d:+.4f} ms/iteration ({(s - d) / d * 100:+.1f}%)")


if __name__ == "__main__":
    main()
