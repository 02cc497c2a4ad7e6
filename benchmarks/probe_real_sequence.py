"""Objective shoot-out on the real-terrain 100-frame odometry chain:
which per-frame objective minimizes driver-visible ATE/RPE? (Calibrates
bench.py's sequence gate; per-pair floors on this surface are PLANE
~1.5 mm, GICP ~0.75 mm — tests/test_realdata.py.)"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from icp_tpu import ICPConfig, ICPParams, Objective
    from icp_tpu.ops.sampling import get_landmarks
    from icp_tpu.sensors import realdata, synthetic
    from icp_tpu.slam import se3
    from icp_tpu.slam.odometry import (absolute_trajectory_error,
                                       odometry_chain_device,
                                       relative_pose_error)
    from icp_tpu.slam.se3 import Pose

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    traj_kw = dict(radius_mm=120.0, yaw_rad=0.12)
    poses = synthetic.orbit_trajectory(n_frames, **traj_kw)
    # Cache key covers everything that shapes the rendered frames: the
    # trajectory parameters and the mtimes of the rendering sources
    # (realdata.py + synthetic.py + the data fixtures) — a stale cache here
    # would silently feed outdated frames into gate-calibration decisions
    # (this probe chose the production GICP mi=8). --no-cache forces a
    # re-render regardless.
    import hashlib
    import os

    import icp_tpu.sensors.realdata as _rd
    import icp_tpu.sensors.synthetic as _sy
    srcs = [os.path.abspath(_rd.__file__), os.path.abspath(_sy.__file__)]
    data_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "data")
    if os.path.isdir(data_dir):
        srcs += sorted(os.path.join(data_dir, f)
                       for f in os.listdir(data_dir))
    key = hashlib.sha1(repr(
        (sorted(traj_kw.items()),
         [(s, os.path.getmtime(s)) for s in srcs])).encode()).hexdigest()[:10]
    cache = f"/tmp/probe_real_seq_lms_{n_frames}_{key}.npy"
    if "--no-cache" in sys.argv and os.path.exists(cache):
        os.remove(cache)
    if os.path.exists(cache):
        lms = jnp.asarray(np.load(cache))
        print(f"loaded cached frames from {cache}", flush=True)
    else:
        surface = realdata.terrain_surface()
        t0 = time.time()
        lms = jnp.stack([
            get_landmarks(jnp.asarray(frame.reshape(-1, 8)))
            for frame in realdata.terrain_frames(
                ((np.asarray(p.q), np.asarray(p.t)) for p in poses),
                surface=surface)])
        jax.block_until_ready(lms)
        np.save(cache, np.asarray(lms))
        print(f"rendered {n_frames} frames in {time.time()-t0:.1f}s",
              flush=True)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()
    gt = [se3.relative(poses[0], p) for p in poses]

    def evaluate(name, config):
        chain = jax.jit(partial(odometry_chain_device, params=params,
                                config=config))
        wq, wt, ks = jax.block_until_ready(chain(lms))
        est = [Pose(np.asarray(wq[i]), np.asarray(wt[i]))
               for i in range(n_frames)]
        ate = absolute_trajectory_error(est, gt)
        rpe_t, rpe_r = relative_pose_error(est, gt, delta=10)
        print(f"{name:28s} ATE={ate:7.2f} mm RPE10={rpe_t:6.2f} mm "
              f"rot={rpe_r:.4f} deg", flush=True)

    from icp_tpu import RobustKernel

    evaluate("plane (r3 gate)",
             ICPConfig(max_iterations=15, estimate_scale=False,
                       objective=Objective.PLANE))
    evaluate("gicp",
             ICPConfig(max_iterations=15, estimate_scale=False,
                       objective=Objective.GICP))
    evaluate("plane_sym",
             ICPConfig(max_iterations=15, estimate_scale=False,
                       objective=Objective.PLANE, plane_symmetric=True))
    evaluate("gicp mi=10",
             ICPConfig(max_iterations=10, estimate_scale=False,
                       objective=Objective.GICP))
    evaluate("gicp+trim adaptive",
             ICPConfig(max_iterations=15, estimate_scale=False,
                       objective=Objective.GICP,
                       robust=RobustKernel.TRIMMED, robust_adaptive=True))
    evaluate("plane+trim adaptive",
             ICPConfig(max_iterations=15, estimate_scale=False,
                       objective=Objective.PLANE,
                       robust=RobustKernel.TRIMMED, robust_adaptive=True))
    evaluate("plane_sym+trim adaptive",
             ICPConfig(max_iterations=15, estimate_scale=False,
                       objective=Objective.PLANE, plane_symmetric=True,
                       robust=RobustKernel.TRIMMED, robust_adaptive=True))


if __name__ == "__main__":
    main()
