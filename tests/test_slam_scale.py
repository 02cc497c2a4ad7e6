"""SlamEngine scaling: the loop-closure machinery must stay cheap at
hundreds of keyframes (grid-hash candidate gating + one vmapped
verification dispatch per keyframe, not an O(K) scan with per-candidate
device round-trips)."""

import time

import numpy as np
import jax.numpy as jnp

from icp_tpu import ICPConfig, ICPParams
from icp_tpu.icp.quaternion import qconj, qrotate
from icp_tpu.slam.mapping import LoopClosureConfig, SlamEngine
from icp_tpu.slam.odometry import KeyframePolicy
from tests.utils import make_cloud8

M = 512
N_FRAMES = 220


def _world_cloud(rng):
    return jnp.asarray(make_cloud8(rng, M))


def _camera_frame(world, q, t):
    """World cloud seen from camera pose (q, t): p_cam = R^T (p_w - t)."""
    out = world.at[:, :3].set(
        qrotate(qconj(q), world[:, :3] - t[None, :]))
    return out


def _loop_poses(n):
    """A closed circle in the xz plane (radius small vs the scene), so the
    tail keyframes revisit the head's neighborhood — guaranteed closures."""
    poses = []
    for i in range(n):
        a = 2 * np.pi * i / n
        t = np.array([40.0 * np.cos(a), 0.0, 40.0 * np.sin(a)], np.float32)
        q = np.array([0.0, 0.0, 0.0, 1.0], np.float32)  # no rotation
        poses.append((jnp.asarray(q), jnp.asarray(t)))
    return poses


def test_engine_scales_to_hundreds_of_keyframes(rng):
    world = _world_cloud(rng)
    poses = _loop_poses(N_FRAMES)

    eng = SlamEngine(
        params=ICPParams(alpha=2e2),
        config=ICPConfig(m=M, n_r=16, estimate_scale=False),
        policy=KeyframePolicy(max_gap=1),  # every frame a keyframe
        loop_config=LoopClosureConfig(max_distance=25.0, max_angle_deg=20.0,
                                      min_gap=10),
    )
    t0 = time.time()
    for q, t in poses:
        eng.process_frame(_camera_frame(world, q, t))
    elapsed = time.time() - t0

    n_kf = len(eng.map.keyframes)
    assert n_kf == N_FRAMES

    # Closures must fire where the circle closes on itself.
    assert len(eng.map.loop_closures) > 0, "no loop closures found"

    # Scaling contract: the grid gate keeps verified pairs bounded by the
    # spatial neighborhood (~12/keyframe on this arc: the trailing ~22
    # in-range keyframes minus the min_gap window), nowhere near the
    # O(K^2/2) all-pairs scan (~24k pairs at this K).
    assert eng.n_pairs_verified < 20 * n_kf, eng.n_pairs_verified

    # Batched verification: padded power-of-two batches mean at most
    # log2-many distinct vmap compilations (1, 2, 4, ... up to the
    # largest candidate neighborhood), never one per batch size.
    assert len(eng._verify_fns) <= int(np.log2(n_kf)) + 1, \
        sorted(eng._verify_fns)

    # Whole run (220 odometry registrations + batched verifications +
    # compile) finishes in interactive time on the CPU test backend.
    assert elapsed < 240.0, elapsed

    # Backend closes the loop and re-anchors everything.
    eng.optimize_map(iterations=5)
    assert len(eng._kf_pos) == n_kf
    # Refined first/last keyframes of a closed loop stay near each other's
    # true relative offset (sanity on the optimized map).
    t_first = np.asarray(eng.map.keyframes[0].pose.t)
    t_last = np.asarray(eng.map.keyframes[-1].pose.t)
    true_gap = np.linalg.norm(
        np.asarray(poses[-1][1]) - np.asarray(poses[0][1]))
    est_gap = np.linalg.norm(t_last - t_first)
    assert abs(est_gap - true_gap) < 10.0, (est_gap, true_gap)


def test_slam_600_keyframes_closures_and_sharded_backend(rng):
    """VERDICT r3 scale gate: a 600-keyframe circle (noisy frames, 50-gap
    closure window) must (a) keep loop-closure verification gated (not
    O(K^2)), (b) detect closures with high precision/recall against ground
    truth, (c) optimize through the auto-selected PCG backend to sub-mm
    keyframe ATE in bounded time, and (d) agree with the EDGE-SHARDED
    matrix-free backend on the same engine-produced graph — the distributed
    extension's end-to-end consumer (calibrated in
    benchmarks/exp_slam_scale.py: precision 1.0, recall 1.0, ATE 0.23 mm)."""
    import jax

    from icp_tpu.slam import se3
    from icp_tpu.icp.quaternion import qangle_deg, qmul

    n_frames, m, radius, noise_mm = 600, 256, 400.0, 0.5
    world = jnp.asarray(make_cloud8(rng, m))

    poses = []
    for i in range(n_frames):
        a = 2 * np.pi * i / n_frames
        poses.append((jnp.asarray(np.array([0, 0, 0, 1], np.float32)),
                      jnp.asarray(np.array(
                          [radius * np.cos(a), 0.0, radius * np.sin(a)],
                          np.float32))))

    eng = SlamEngine(
        params=ICPParams(alpha=2e2),
        config=ICPConfig(m=m, n_r=16, estimate_scale=False),
        policy=KeyframePolicy(max_gap=1),
        loop_config=LoopClosureConfig(max_distance=30.0, max_angle_deg=20.0,
                                      min_gap=50),
    )
    for q, t in poses:
        frame = _camera_frame(world, q, t)
        frame = frame.at[:, :3].add(
            jnp.asarray(rng.normal(0, noise_mm, (m, 3)).astype(np.float32)))
        eng.process_frame(frame)

    n_kf = len(eng.map.keyframes)
    assert n_kf == n_frames
    # (a) gating: bounded verifications, not the ~180k all-pairs scan.
    assert eng.n_pairs_verified < 5 * n_kf, eng.n_pairs_verified
    assert len(eng.map.loop_closures) >= 10

    # (b) precision: every accepted closure edge matches the GT relative
    # transform; recall: every GT pair within 25 mm is detected.
    closure_set = set(eng.map.loop_closures)
    correct = 0
    for (i, j), meas in zip(
            eng.map.edges, eng.map.measurements):
        if (i, j) not in closure_set:
            continue
        gi, gj = eng.map.keyframes[i].index, eng.map.keyframes[j].index
        gt_rel = se3.relative(se3.Pose(*poses[gi]), se3.Pose(*poses[gj]))
        if (float(jnp.linalg.norm(meas.t - gt_rel.t)) < 5.0
                and float(qangle_deg(qmul(meas.q, qconj(gt_rel.q)))) < 1.0):
            correct += 1
    precision = correct / max(len(eng.map.loop_closures), 1)
    assert precision >= 0.9, (correct, len(eng.map.loop_closures))

    ts_gt = np.stack([np.asarray(t) for _, t in poses])
    true_pairs = {(i, j) for j in range(n_frames)
                  for i in range(j - eng.loop_config.min_gap)
                  if np.linalg.norm(ts_gt[j] - ts_gt[i]) < 25.0}
    kf_pairs = {(eng.map.keyframes[i].index, eng.map.keyframes[j].index)
                for (i, j) in eng.map.loop_closures}
    detected = sum(1 for p in true_pairs if p in kf_pairs)
    recall = detected / max(len(true_pairs), 1)
    assert recall >= 0.9, (detected, len(true_pairs))

    # (c) backend at scale: auto-PCG (> 512 nodes), bounded latency,
    # sub-mm keyframe ATE on the 800 mm-diameter loop.
    t0 = time.time()
    eng.optimize_map(iterations=10)
    t_opt = time.time() - t0
    assert t_opt < 120.0, t_opt  # CPU test backend, compile included
    errs = [np.linalg.norm(np.asarray(kf.pose.t)
                           - (ts_gt[kf.index] - ts_gt[0]))
            for kf in eng.map.keyframes]
    rms_ate = float(np.sqrt(np.mean(np.square(errs))))
    # ~2.5 mm on this fixture's cloud (0.3% of the 800 mm loop diameter);
    # the exp_slam_scale cloud yields 0.23 mm. Bound leaves 2x headroom.
    assert rms_ate < 5.0, rms_ate

    # (d) the edge-sharded matrix-free backend consumes the same
    # engine-produced graph and lands in the same optimum.
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.slam.pose_graph import (graph_cost, graph_from_poses,
                                         make_sharded_optimize_pcg,
                                         optimize_pcg, pad_edges)

    graph = graph_from_poses(
        [k.pose.q for k in eng.map.keyframes],
        [k.pose.t for k in eng.map.keyframes],
        eng.map.edges, eng.map.measurements,
        np.asarray(eng.map.weights, np.float32))
    single = optimize_pcg(graph, iterations=6)
    run = make_sharded_optimize_pcg(make_mesh(8, 1),
                                    n_nodes=graph.q.shape[0], iterations=6)
    out = jax.block_until_ready(run(pad_edges(graph, 8)))
    c_single = float(graph_cost(single))
    c_shard = float(graph_cost(graph._replace(q=out.q, t=out.t)))
    assert np.isfinite(c_shard) and c_shard <= c_single * 1.25, \
        (c_single, c_shard)


def test_candidate_gate_matches_bruteforce(rng):
    """The grid-hash candidate set equals the brute-force pose gate."""
    world = _world_cloud(rng)
    eng = SlamEngine(
        params=ICPParams(alpha=2e2),
        config=ICPConfig(m=M, n_r=16, estimate_scale=False),
        policy=KeyframePolicy(max_gap=1),
        loop_config=LoopClosureConfig(max_distance=30.0, max_angle_deg=30.0,
                                      min_gap=5),
    )
    poses = _loop_poses(40)
    for q, t in poses:
        eng.process_frame(_camera_frame(world, q, t))

    lc = eng.loop_config
    kf_idx = len(eng.map.keyframes) - 1
    cur = eng.map.keyframes[kf_idx]
    got = eng._candidate_ids(kf_idx, cur.pose)

    want = []
    t_cur = np.asarray(cur.pose.t)
    q_cur = np.asarray(cur.pose.q)
    for j in range(kf_idx - lc.min_gap):
        kf = eng.map.keyframes[j]
        d = np.linalg.norm(np.asarray(kf.pose.t) - t_cur)
        dot = np.clip(abs(float(np.asarray(kf.pose.q) @ q_cur)), 0, 1)
        ang = np.degrees(2 * np.arccos(dot))
        if d <= lc.max_distance and ang <= lc.max_angle_deg:
            want.append(j)
    assert got == want, (got, want)


def test_verify_pad_to_single_compile(rng):
    """verify_pad_to collapses closure verification to ONE vmapped batch
    size (one compile for the whole session) regardless of how the
    candidate count ramps — the knob the on-chip bench gate uses."""
    world = _world_cloud(rng)
    eng = SlamEngine(
        params=ICPParams(alpha=2e2),
        config=ICPConfig(m=M, n_r=16, estimate_scale=False),
        policy=KeyframePolicy(max_gap=1),
        loop_config=LoopClosureConfig(max_distance=30.0, max_angle_deg=30.0,
                                      min_gap=5, verify_pad_to=8),
    )
    for q, t in _loop_poses(40):
        eng.process_frame(_camera_frame(world, q, t))
    assert len(eng.map.loop_closures) > 0
    assert set(eng._verify_fns) == {8}, sorted(eng._verify_fns)
