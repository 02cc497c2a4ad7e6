"""Frame-to-frame odometry throughput (BASELINE config 3): frames/s over a
synthetic Kinect sequence on the current backend.

The WHOLE chain runs as one device dispatch (lax.scan of full
registrations, icp_tpu.slam.odometry.odometry_chain_device), and frames/s
is the MARGINAL rate (T(n_frames) - T(n_frames/2)) differencing — per-call
wall timing is untrustworthy on relay backends whose block_until_ready
returns at enqueue for async chains, and differencing also removes the
constant dispatch cost (same methodology as bench.py).
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--iters", type=int, default=15,
                    help="fixed ICP iterations per frame (typical convergence)")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.ops.sampling import get_landmarks
    from icp_tpu.sensors import synthetic
    from icp_tpu.slam.odometry import odometry_chain_device

    config = ICPConfig(max_iterations=args.iters, estimate_scale=False)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()

    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(args.frames, radius_mm=50.0,
                                       yaw_rad=0.05)
    print(f"rendering {args.frames} frames...")
    lms = jnp.stack([
        get_landmarks(synthetic.render_cloud(scene, p).reshape(-1, 8))
        for p in poses
    ])
    jax.block_until_ready(lms)

    chain = jax.jit(partial(odometry_chain_device, params=params,
                            config=config))

    def timed(seq) -> float:
        q, t, ks = jax.block_until_ready(chain(seq))
        # Host read of the LAST scan output drains the whole chain (scan
        # steps are data-dependent), defeating enqueue-time readiness.
        assert int(ks[-1]) == args.iters, int(ks[-1])
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = chain(seq)
            _ = int(out[2][-1])
            times.append(time.perf_counter() - t0)
        return min(times)

    n_hi = args.frames
    n_lo = max(args.frames // 2, 2)
    t_hi = timed(lms)
    t_lo = timed(lms[:n_lo])
    per_frame = (t_hi - t_lo) / (n_hi - n_lo)
    fps = 1.0 / per_frame

    print(json.dumps({
        "metric": "odometry_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "iters_per_frame": args.iters,
        "marginal_ms_per_frame": round(per_frame * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
