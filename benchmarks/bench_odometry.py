"""Frame-to-frame odometry throughput (BASELINE config 3): frames/s over a
synthetic Kinect sequence on the current backend.

Per frame: landmark sampling + RBC build over the previous frame + full
registration to convergence — the steady-state work of the odometry chain.
"""

from __future__ import annotations

import argparse
import json
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--iters", type=int, default=15,
                    help="fixed ICP iterations per frame (typical convergence)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams, register
    from icp_tpu.ops.sampling import get_landmarks
    from icp_tpu.sensors import synthetic

    config = ICPConfig(max_iterations=args.iters, estimate_scale=False)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()

    scene = synthetic.default_scene()
    poses = synthetic.orbit_trajectory(args.frames, radius_mm=50.0,
                                       yaw_rad=0.05)
    print(f"rendering {args.frames} frames...")
    lms = [jax.block_until_ready(
        get_landmarks(synthetic.render_cloud(scene, p).reshape(-1, 8)))
        for p in poses]

    # Warmup/compile.
    jax.block_until_ready(register(lms[0], lms[1], params, config))

    t0 = time.perf_counter()
    for i in range(1, args.frames):
        jax.block_until_ready(register(lms[i - 1], lms[i], params, config))
    dt = time.perf_counter() - t0
    fps = (args.frames - 1) / dt

    print(json.dumps({
        "metric": "odometry_frames_per_s",
        "value": round(fps, 2),
        "unit": "frames/s",
        "iters_per_frame": args.iters,
    }))


if __name__ == "__main__":
    main()
