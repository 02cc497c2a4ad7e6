"""On-chip calibration of the LiDAR-scale path (VERDICT r4 item 2):
knn_normals_rbc latency at 262144 points + unorganized PLANE/GICP
registration accuracy at that scale (calibrates bench.py's 16x gates).

    PYTHONPATH=/root/repo:$PYTHONPATH python -u benchmarks/probe_knn16x.py
"""

import sys
import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams, Objective, register
    from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
    from icp_tpu.ops.normals import knn_normals_rbc
    from probe_16x import surface_pair

    m, n_r = (262144, 2048)
    if len(sys.argv) > 2:
        m, n_r = int(sys.argv[1]), int(sys.argv[2])
    fixed_np, moving_np, q_gt, t_gt = surface_pair(m)
    fixed, moving = jnp.asarray(fixed_np), jnp.asarray(moving_np)

    # knn normals latency: loop-composed marginal differencing.
    @partial(jax.jit, static_argnames=("n",))
    def run_knn(pts, n):
        def body(i, pts):
            nrm = knn_normals_rbc(pts)
            return pts.at[:, 7].set(1.0 + jnp.sum(nrm[0]) * 1e-20)
        return jax.lax.fori_loop(0, n, body, pts)

    def t_of(n):
        out = run_knn(fixed, n)
        float(np.asarray(out[0, 0]))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = run_knn(fixed, n)
            float(np.asarray(out[0, 0]))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    hi, lo = 20, 4
    per = (t_of(hi) - t_of(lo)) / (hi - lo)
    print(f"knn_normals_rbc({m}) {per*1e3:.3f} ms", flush=True)

    acc_params = ICPParams(alpha=2e2).as_f32()
    for obj in (Objective.PLANE, Objective.GICP):
        cfg = ICPConfig(m=m, n_r=n_r, estimate_scale=False, objective=obj,
                        normal_mode="knn")
        t0 = time.perf_counter()
        st = jax.block_until_ready(register(fixed, moving, acc_params, cfg))
        dt = time.perf_counter() - t0
        t_err = float(jnp.linalg.norm(st.t - jnp.asarray(t_gt)))
        a_err = float(qangle_deg(qmul(st.q, qconj(jnp.asarray(q_gt)))))
        t1 = time.perf_counter()
        st = jax.block_until_ready(register(fixed, moving, acc_params, cfg))
        dt2 = time.perf_counter() - t1
        print(f"[{m}x{n_r}] {obj.value} UNORGANIZED k={int(st.k)} "
              f"t_err={t_err:.4f} mm a_err={a_err:.6f} deg "
              f"(first {dt:.1f}s, warm {dt2*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
