"""Alternating same-process A/B harness for composed-iteration probes.

Single-pass orderings (time A, then B) are vulnerable to chip-clock drift
of the same magnitude as the effects under test (profile_gicp_composed
mis-read rowcat 3-5% ahead this way; the alternating rerun showed sublane
ahead on every pair). This helper times the variants in alternating pairs
A,B,A,B,... and reports the per-pair deltas — drift that varies slowly
across the run cancels to first order, and the MEDIAN pairwise delta is
the decision statistic.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

N_HI, N_LO = 120, 24


def ab_compare(make_run, variants, carry0, *, n_hi=N_HI, n_lo=N_LO,
               npairs=5, reps=3):
    """Time composed fori_loop variants in alternating pairs.

    Args:
      make_run: variant_key -> jitted ``run(carry, n)`` running the body n
        times (n static).
      variants: sequence of variant keys; the FIRST is the baseline the
        deltas are reported against.
      carry0: initial carry.
    Returns:
      dict variant -> list of per-pass ms/iter, and prints per-pair deltas.
    """
    import jax

    runners = {v: make_run(v) for v in variants}

    def t_of(v, n):
        out = runners[v](carry0, n)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = runners[v](carry0, n)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    for v in variants:  # compile everything before any timing
        t_of(v, n_hi)
        t_of(v, n_lo)

    series = {v: [] for v in variants}
    base = variants[0]
    for p in range(npairs):
        per = {}
        for v in variants:
            per[v] = (t_of(v, n_hi) - t_of(v, n_lo)) / (n_hi - n_lo) * 1e3
            series[v].append(per[v])
        deltas = "  ".join(f"{v}:{per[v] - per[base]:+.4f}"
                           for v in variants[1:])
        print(f"pair {p}: {base}={per[base]:.4f} ms  {deltas}", flush=True)
    # Single sign convention throughout: variant - base (positive = the
    # variant is SLOWER), matching the per-pair delta lines above.
    for v in variants[1:]:
        d = np.median([a - b for a, b in zip(series[v], series[base])])
        print(f"median delta {v} - {base}: {d:+.4f} ms (n={npairs})",
              flush=True)
    return series
