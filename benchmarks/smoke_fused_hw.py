"""Hardware smoke of the fused POINT pipeline: compile + accuracy on the
real chip (interpret-mode-green Mosaic code can still hit compile walls or
bf16 traps that only hardware reveals — see docs/ROADMAP.md).

Registers a rendered pair with known ground truth under the fused POINT
path and the unfused path, printing transform errors for both. Expect
~3 mm / ~0.01 deg POINT-objective errors (the landmark-pitch floor).
"""

from __future__ import annotations

import dataclasses

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams, register
    from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
    from icp_tpu.ops.sampling import get_landmarks
    from icp_tpu.sensors import synthetic
    from icp_tpu.slam import se3

    print("backend:", jax.default_backend())
    scene = synthetic.default_scene()
    q_gt = np.array([0, np.sin(0.004), 0, np.cos(0.004)], np.float32)
    t_gt = np.array([10.0, -6.0, 8.0], np.float32)
    pose_b = synthetic.CameraPose(jnp.asarray(q_gt), jnp.asarray(t_gt))
    la = get_landmarks(synthetic.render_cloud(
        scene, synthetic.CameraPose.identity()).reshape(-1, 8))
    lb = get_landmarks(synthetic.render_cloud(scene, pose_b).reshape(-1, 8))
    rel = se3.relative(synthetic.CameraPose.identity(), pose_b)
    params = ICPParams(alpha=2e2).as_f32()

    errs = {}
    for fused in (True, False):
        cfg = dataclasses.replace(ICPConfig(estimate_scale=False),
                                  fused_point=fused)
        st = jax.block_until_ready(register(la, lb, params, cfg))
        t_err = float(jnp.linalg.norm(st.t - rel.t))
        a_err = float(qangle_deg(qmul(st.q, qconj(rel.q))))
        errs[fused] = (t_err, a_err)
        print(f"fused_point={fused}: k={int(st.k)} "
              f"t_err={t_err:.4f} mm ang_err={a_err:.5f} deg")
        # POINT-objective landmark-pitch floor is ~3 mm / ~0.1 deg
        # (PLANE goes sub-mm; bench.py's gate covers that).
        assert t_err < 5.0 and a_err < 0.5, (fused, t_err, a_err)
    # The real check: fused and unfused must land at the same answer.
    assert abs(errs[True][0] - errs[False][0]) < 1.0, errs
    assert abs(errs[True][1] - errs[False][1]) < 0.05, errs
    print("smoke ok")


if __name__ == "__main__":
    main()
