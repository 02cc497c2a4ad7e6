"""Calibration experiment: 100-frame rendered-sequence odometry ATE/RPE
on the current backend — sizes the bounds and runtime for the bench.py
sequence gate (VERDICT r2 item 7)."""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial

from icp_tpu import ICPConfig, ICPParams
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.sensors import synthetic
from icp_tpu.slam.odometry import (absolute_trajectory_error,
                                   odometry_chain_device,
                                   relative_pose_error)
from icp_tpu.slam.se3 import Pose

N_FRAMES = 100


def main():
    from icp_tpu import Objective
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()

    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(N_FRAMES, radius_mm=120.0,
                                       yaw_rad=0.12)
    t0 = time.perf_counter()
    render = jax.jit(lambda q, t: get_landmarks(synthetic.render_cloud(
        scene, synthetic.CameraPose(q, t)).reshape(-1, 8)))
    lms = jnp.stack([render(p.q, p.t) for p in poses])
    jax.block_until_ready(lms)
    t_render = time.perf_counter() - t0
    print(f"render {N_FRAMES} frames: {t_render:.1f}s")

    from icp_tpu.slam import se3
    gt = [se3.relative(poses[0], p) for p in poses]
    path_len = sum(float(np.linalg.norm(np.asarray(gt[i + 1].t)
                                        - np.asarray(gt[i].t)))
                   for i in range(N_FRAMES - 1))
    print(f"path length {path_len:.0f} mm")

    for name, config in [
        ("point", ICPConfig(max_iterations=15, estimate_scale=False)),
        ("plane", ICPConfig(max_iterations=15, estimate_scale=False,
                            objective=Objective.PLANE)),
    ]:
        chain = jax.jit(partial(odometry_chain_device, params=params,
                                config=config))
        t0 = time.perf_counter()
        wq, wt, ks = jax.block_until_ready(chain(lms))
        t_compile = time.perf_counter() - t0
        t0 = time.perf_counter()
        wq, wt, ks = jax.block_until_ready(chain(lms))
        _ = int(ks[-1])
        t_run = time.perf_counter() - t0

        est = [Pose(np.asarray(wq[i]), np.asarray(wt[i]))
               for i in range(N_FRAMES)]
        ate = absolute_trajectory_error(est, gt)
        rpe_t, rpe_r = relative_pose_error(est, gt, delta=10)
        print(f"{name}: compile {t_compile:.1f}s, run {t_run:.2f}s "
              f"({t_run / (N_FRAMES - 1) * 1e3:.2f} ms/frame), "
              f"ATE {ate:.3f} mm, RPE(10) {rpe_t:.3f} mm / {rpe_r:.4f} deg")


if __name__ == "__main__":
    main()
