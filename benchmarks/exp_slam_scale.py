"""Calibration experiment for the 600-keyframe SLAM scale test
(VERDICT r2 item 8): runtime, closure precision/recall, optimize latency."""

from __future__ import annotations

import os
import time

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from icp_tpu import ICPConfig, ICPParams  # noqa: E402
from icp_tpu.icp.quaternion import qconj, qrotate, qangle_deg, qmul  # noqa: E402
from icp_tpu.slam.mapping import LoopClosureConfig, SlamEngine  # noqa: E402
from icp_tpu.slam.odometry import KeyframePolicy  # noqa: E402
from icp_tpu.slam import se3  # noqa: E402

M = 256
N_FRAMES = 600
RADIUS = 400.0
NOISE_MM = 0.5


def make_cloud(rng, n):
    c = np.ones((n, 8), np.float32)
    c[:, :3] = rng.uniform(-600, 600, (n, 3))
    c[:, 2] += 1500
    c[:, 4:7] = rng.uniform(0, 1, (n, 3))
    return c


def main():
    rng = np.random.default_rng(7)
    world = make_cloud(rng, M)

    poses = []
    for i in range(N_FRAMES):
        a = 2 * np.pi * i / N_FRAMES
        t = np.array([RADIUS * np.cos(a), 0.0, RADIUS * np.sin(a)],
                     np.float32)
        q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)
        poses.append((q, t))

    def camera_frame(q, t, noise_rng):
        pts = world[:, :3] - t[None, :]
        out = world.copy()
        out[:, :3] = np.asarray(qrotate(qconj(jnp.asarray(q)),
                                        jnp.asarray(pts)))
        out[:, :3] += noise_rng.normal(0, NOISE_MM, (M, 3)).astype(np.float32)
        return jnp.asarray(out)

    eng = SlamEngine(
        params=ICPParams(alpha=2e2),
        config=ICPConfig(m=M, n_r=16, estimate_scale=False),
        policy=KeyframePolicy(max_gap=1),
        loop_config=LoopClosureConfig(max_distance=30.0, max_angle_deg=20.0,
                                      min_gap=50),
    )
    t0 = time.time()
    for q, t in poses:
        eng.process_frame(camera_frame(q, t, rng))
    t_ingest = time.time() - t0
    n_kf = len(eng.map.keyframes)
    print(f"ingest {N_FRAMES} frames: {t_ingest:.1f}s, kf={n_kf}, "
          f"verified={eng.n_pairs_verified}, "
          f"closures={len(eng.map.loop_closures)}")

    # Ground-truth closure set: gap-separated pairs within 25 mm in GT.
    lc = eng.loop_config
    ts_gt = np.stack([t for _, t in poses])
    true_pairs = set()
    for j in range(N_FRAMES):
        for i in range(j - lc.min_gap):
            if np.linalg.norm(ts_gt[j] - ts_gt[i]) < 25.0:
                true_pairs.add((i, j))
    print(f"true pairs (<25mm): {len(true_pairs)}")

    # Precision: accepted closure edge matches the GT relative transform.
    correct = 0
    for (i, j), meas in zip(
            eng.map.loop_closures,
            [m for e, m in zip(eng.map.edges, eng.map.measurements)
             if e in eng.map.loop_closures]):
        gi, gj = eng.map.keyframes[i].index, eng.map.keyframes[j].index
        gt_rel = se3.relative(
            se3.Pose(jnp.asarray(poses[gi][0]), jnp.asarray(poses[gi][1])),
            se3.Pose(jnp.asarray(poses[gj][0]), jnp.asarray(poses[gj][1])))
        t_err = float(jnp.linalg.norm(meas.t - gt_rel.t))
        a_err = float(qangle_deg(qmul(meas.q, qconj(gt_rel.q))))
        if t_err < 5.0 and a_err < 1.0:
            correct += 1
    n_det = len(eng.map.loop_closures)
    detected_true = sum(1 for p in eng.map.loop_closures if p in true_pairs)
    prec = correct / max(n_det, 1)
    rec = detected_true / max(len(true_pairs), 1)
    print(f"precision {prec:.3f} ({correct}/{n_det}), "
          f"recall-vs-25mm {rec:.3f} ({detected_true}/{len(true_pairs)})")

    # Optimize latency (auto-PCG at >512 nodes).
    t0 = time.time()
    out = eng.optimize_map(iterations=10)
    t_opt = time.time() - t0
    print(f"optimize_map (n={n_kf}, pcg): {t_opt:.2f}s")

    # ATE before/after (GT re-anchored to frame 0: estimates live in the
    # frame-0 gauge; identity GT rotations make the re-anchor a subtract).
    errs = [np.linalg.norm(np.asarray(kf.pose.t)
                           - (ts_gt[kf.index] - ts_gt[0]))
            for kf in eng.map.keyframes]
    print(f"post-optimize keyframe RMS ATE: "
          f"{np.sqrt(np.mean(np.square(errs))):.3f} mm")

    # Sharded pose-graph backend at the same scale == single-device.
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.slam.pose_graph import (graph_from_poses,
                                         make_sharded_optimize, optimize,
                                         pad_edges)

    graph = graph_from_poses(
        [k.pose.q for k in eng.map.keyframes],
        [k.pose.t for k in eng.map.keyframes],
        eng.map.edges, eng.map.measurements,
        np.asarray(eng.map.weights, np.float32))
    t0 = time.time()
    single = jax.block_until_ready(optimize(graph, iterations=6))
    t_single = time.time() - t0
    mesh = make_mesh(8, 1)
    run = make_sharded_optimize(mesh, n_nodes=graph.q.shape[0], iterations=6)
    t0 = time.time()
    out = jax.block_until_ready(run(pad_edges(graph, 8)))
    t_shard = time.time() - t0
    dt = np.abs(np.asarray(out.t) - np.asarray(single.t)).max()
    print(f"dense single {t_single:.2f}s, sharded(8) {t_shard:.2f}s, "
          f"max |t diff| {dt:.2e} mm")


if __name__ == "__main__":
    main()
