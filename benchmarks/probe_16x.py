"""Probe the scaled workloads (4x = 65536x1024, 16x = 262144x2048) on the
real chip: compile + run the POINT registration on an INDEPENDENTLY-sampled
ground-truth pair (each cloud its own random sampling of the same analytic
surface, so correspondences are approximate — a real registration problem,
unlike __graft_entry__._synthetic_pair whose moving cloud is the fixed
cloud transformed point-for-point), report accuracy vs the known transform
and the marginal per-iteration latency.

Calibrates bench.py's scaled-shape accuracy gates (VERDICT r4 item 3) and
the 16x metric (item 1).
"""

from __future__ import annotations

import sys
import time

import numpy as np


def surface_pair(m: int, seed_a: int = 1, seed_b: int = 2):
    """Shared generator (icp_tpu.sensors.synthetic.wavy_surface_pair) —
    the same pair bench.py's scaled-shape accuracy gates register."""
    from icp_tpu.sensors.synthetic import wavy_surface_pair

    return wavy_surface_pair(m, seed_a, seed_b)


def main():
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams, register
    from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul

    shapes = [(65536, 1024), (262144, 2048)]
    if len(sys.argv) > 2:
        shapes = [(int(sys.argv[1]), int(sys.argv[2]))]

    params0 = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                        translation_threshold=0.0).as_f32()
    acc_params = ICPParams(alpha=2e2).as_f32()

    for m, n_r in shapes:
        fixed_np, moving_np, q_gt, t_gt = surface_pair(m)
        fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)

        # Accuracy: normal thresholds, converge naturally.
        cfg = ICPConfig(m=m, n_r=n_r, estimate_scale=False)
        t0 = time.perf_counter()
        st = jax.block_until_ready(register(fixed, moving, acc_params, cfg))
        t_compile = time.perf_counter() - t0
        t_err = float(jnp.linalg.norm(st.t - jnp.asarray(t_gt)))
        a_err = float(qangle_deg(qmul(st.q, qconj(jnp.asarray(q_gt)))))
        print(f"[{m}x{n_r}] POINT k={int(st.k)} t_err={t_err:.4f} mm "
              f"a_err={a_err:.6f} deg (first dispatch incl compile "
              f"{t_compile:.1f}s)", flush=True)

        # Latency: marginal differencing at fixed iteration counts.
        hi, lo = 40, 8
        cfgs = {k: ICPConfig(m=m, n_r=n_r, max_iterations=k)
                for k in (hi, lo)}
        for k, c in cfgs.items():
            s = jax.block_until_ready(register(fixed, moving, params0, c))
            assert int(s.k) == k

        best = {hi: float("inf"), lo: float("inf")}
        for _ in range(6):
            for k in (hi, lo):
                t0 = time.perf_counter()
                out = register(fixed, moving, params0, cfgs[k])
                assert int(out.k) == k
                best[k] = min(best[k], time.perf_counter() - t0)
        per_iter = (best[hi] - best[lo]) / (hi - lo) * 1e3
        print(f"[{m}x{n_r}] per-iteration {per_iter:.4f} ms "
              f"(T40={best[hi]*1e3:.1f} T8={best[lo]*1e3:.1f})", flush=True)


if __name__ == "__main__":
    main()
