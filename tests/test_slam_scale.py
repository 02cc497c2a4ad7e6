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
