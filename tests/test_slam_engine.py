"""SLAM engine tests: keyframing, loop closure, optimization, checkpoints."""

import numpy as np
import jax.numpy as jnp

from icp_tpu import ICPConfig, ICPParams
from icp_tpu.sensors import synthetic
from icp_tpu.slam import se3
from icp_tpu.slam.checkpoint import load_session, save_session
from icp_tpu.slam.mapping import LoopClosureConfig, SlamEngine
from icp_tpu.slam.odometry import KeyframePolicy


def _engine(max_gap=1):
    return SlamEngine(
        ICPParams(alpha=2e2),
        ICPConfig(estimate_scale=False, max_iterations=40),
        policy=KeyframePolicy(max_gap=max_gap),
        loop_config=LoopClosureConfig(min_gap=3, max_distance=100.0),
    )


def _loop_trajectory(n):
    """A there-and-back path: end returns near the start -> loop closure."""
    import numpy as np

    poses = []
    for i in range(n):
        frac = i / (n - 1)
        out_and_back = 1.0 - abs(2 * frac - 1.0)  # 0 -> 1 -> 0
        t = np.array([40.0 * out_and_back, 0.0, 25.0 * out_and_back],
                     np.float32)
        ang = 0.01 * out_and_back
        q = np.array([0, np.sin(ang / 2), 0, np.cos(ang / 2)], np.float32)
        poses.append(synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t)))
    return poses


def test_engine_tracks_and_closes_loop(rng):
    scene = synthetic.default_scene()
    poses = _loop_trajectory(5)
    eng = _engine(max_gap=1)  # every frame a keyframe
    for p in poses:
        eng.process_frame(synthetic.render_cloud(scene, p))

    assert len(eng.trajectory) == 5
    assert len(eng.map.keyframes) == 5
    # The return to the start must close at least one loop.
    assert len(eng.map.loop_closures) >= 1
    # Optimize; the backend must keep the anchor fixed and not blow up.
    eng.optimize_map(iterations=5)
    assert float(jnp.linalg.norm(eng.map.keyframes[0].pose.t)) < 1e-3
    for kf, gt in zip(eng.map.keyframes, poses):
        err = np.linalg.norm(np.asarray(kf.pose.t) - np.asarray(gt.t))
        assert err < 20.0, err


def test_engine_incremental_optimize(rng):
    """iSAM-style mode: every accepted closure triggers a warm-started
    incremental smoothing pass, so poses are already near-optimal without a
    final batch optimize_map."""
    scene = synthetic.default_scene()
    poses = _loop_trajectory(5)
    eng = SlamEngine(
        ICPParams(alpha=2e2),
        ICPConfig(estimate_scale=False, max_iterations=40),
        policy=KeyframePolicy(max_gap=1),
        loop_config=LoopClosureConfig(min_gap=3, max_distance=100.0),
        incremental_optimize=True, incremental_iterations=5,
    )
    for p in poses:
        eng.process_frame(synthetic.render_cloud(scene, p))
    assert len(eng.map.loop_closures) >= 1
    assert eng.n_incremental_updates >= 1
    # Anchor stays fixed; poses already near ground truth WITHOUT a final
    # batch optimize_map call.
    assert float(jnp.linalg.norm(eng.map.keyframes[0].pose.t)) < 1e-3
    for kf, gt in zip(eng.map.keyframes, poses):
        err = np.linalg.norm(np.asarray(kf.pose.t) - np.asarray(gt.t))
        assert err < 20.0, err
    # Trajectory mirrors the keyframe poses (re-anchoring ran).
    for kf in eng.map.keyframes:
        np.testing.assert_allclose(np.asarray(eng.trajectory[kf.index].t),
                                   np.asarray(kf.pose.t), atol=1e-4)


def test_pad_nodes_is_inert(rng):
    """Padded (edge-free identity) nodes must not change the solution for
    the real nodes, and their own update must be ~zero."""
    from icp_tpu.slam.pose_graph import (graph_from_poses, optimize,
                                         pad_edges, pad_nodes)

    qs, ts, edges, meas = [], [], [], []
    q0 = jnp.asarray(np.array([0, 0, 0, 1], np.float32))
    for i in range(5):
        qs.append(q0)
        ts.append(jnp.asarray(np.array([10.0 * i, 0, 0], np.float32)
                              + rng.normal(0, 1.0, 3).astype(np.float32)))
        if i > 0:
            edges.append((i - 1, i))
            meas.append(se3.Pose(q0, jnp.asarray(
                np.array([10.0, 0, 0], np.float32))))
    g = graph_from_poses(qs, ts, edges, meas)
    out_plain = optimize(g, iterations=5)
    out_pad = optimize(pad_edges(pad_nodes(g, 8), 16), iterations=5)
    np.testing.assert_allclose(np.asarray(out_pad.t[:5]),
                               np.asarray(out_plain.t), atol=1e-3)
    np.testing.assert_allclose(np.asarray(out_pad.q[:5]),
                               np.asarray(out_plain.q), atol=1e-5)
    # padded nodes unchanged (identity in, identity out)
    np.testing.assert_allclose(np.asarray(out_pad.t[5:]), 0.0, atol=1e-5)


def test_engine_with_pyramid(rng):
    """Pyramid-enabled engine tracks a fast-motion trajectory that chains
    through the same API."""
    scene = synthetic.default_scene()
    poses = _loop_trajectory(3)
    eng = SlamEngine(ICPParams(alpha=2e2),
                     ICPConfig(estimate_scale=False),
                     policy=KeyframePolicy(max_gap=1),
                     use_pyramid=True, pyramid_strides=(4, 1))
    for p in poses:
        eng.process_frame(synthetic.render_cloud(scene, p))
    assert len(eng.trajectory) == 3
    for kf, gt in zip(eng.map.keyframes, poses):
        err = np.linalg.norm(np.asarray(kf.pose.t) - np.asarray(gt.t))
        assert err < 20.0, err


def test_checkpoint_orbax_roundtrip(tmp_path, rng):
    import pytest

    pytest.importorskip("orbax.checkpoint")
    scene = synthetic.default_scene()
    poses = _loop_trajectory(3)
    eng = _engine(max_gap=1)
    for p in poses:
        eng.process_frame(synthetic.render_cloud(scene, p))

    path = save_session(eng, str(tmp_path / "ckpt"), backend="orbax")
    eng2 = load_session(path, _engine(max_gap=1), backend="orbax")
    assert len(eng2.trajectory) == len(eng.trajectory)
    np.testing.assert_allclose(np.asarray(eng2.trajectory[-1].t),
                               np.asarray(eng.trajectory[-1].t), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(eng2.map.keyframes[0].landmarks),
        np.asarray(eng.map.keyframes[0].landmarks))


def test_checkpoint_roundtrip(tmp_path, rng):
    scene = synthetic.default_scene()
    poses = _loop_trajectory(4)
    eng = _engine(max_gap=1)
    for p in poses:
        eng.process_frame(synthetic.render_cloud(scene, p))

    path = save_session(eng, str(tmp_path / "session"))
    eng2 = load_session(path, _engine(max_gap=1))

    assert len(eng2.trajectory) == len(eng.trajectory)
    assert len(eng2.map.keyframes) == len(eng.map.keyframes)
    assert eng2.map.edges == eng.map.edges
    np.testing.assert_allclose(np.asarray(eng2.trajectory[-1].t),
                               np.asarray(eng.trajectory[-1].t), atol=1e-5)
    np.testing.assert_array_equal(
        np.asarray(eng2.map.keyframes[0].landmarks),
        np.asarray(eng.map.keyframes[0].landmarks))

    # Resumed engine keeps processing frames.
    eng2.process_frame(synthetic.render_cloud(scene, poses[0]))
    assert len(eng2.trajectory) == len(eng.trajectory) + 1


def test_checkpoint_restores_full_config(tmp_path, rng):
    """load_session(engine=None) must reconstruct the SAVED algorithm
    configuration, not defaults (a resumed session running a different
    algorithm would silently diverge)."""
    from icp_tpu import Objective, RotationMode

    scene = synthetic.default_scene()
    eng = SlamEngine(
        ICPParams(alpha=3e2, translation_threshold=0.02),
        ICPConfig(estimate_scale=False, objective=Objective.PLANE,
                  rotation=RotationMode.SVD, max_iterations=25),
        policy=KeyframePolicy(max_gap=2, max_translation=55.0),
        loop_config=LoopClosureConfig(min_gap=4, max_distance=123.0),
        use_pyramid=True, pyramid_strides=(2, 1),
    )
    for p in _loop_trajectory(3):
        eng.process_frame(synthetic.render_cloud(scene, p))

    path = save_session(eng, str(tmp_path / "cfg"))
    eng2 = load_session(path)  # engine=None: reconstruct from meta
    assert eng2.config == eng.config
    assert float(eng2.params.alpha) == float(eng.params.alpha)
    assert float(eng2.params.translation_threshold) == float(
        eng.params.translation_threshold)
    assert eng2.policy == eng.policy
    assert eng2.loop_config == eng.loop_config
    assert eng2.use_pyramid is True
    assert eng2.pyramid_strides == (2, 1)


def test_optimize_map_reanchors_trajectory(rng):
    """After optimize_map, the trajectory must reflect the refined keyframe
    poses (ATE reporting / checkpoints / resume read the trajectory)."""
    scene = synthetic.default_scene()
    poses = _loop_trajectory(5)
    eng = _engine(max_gap=1)
    for p in poses:
        eng.process_frame(synthetic.render_cloud(scene, p))
    eng.optimize_map(iterations=5)
    # Every keyframe's trajectory entry must equal its refined pose.
    for kf in eng.map.keyframes:
        np.testing.assert_allclose(np.asarray(eng.trajectory[kf.index].t),
                                   np.asarray(kf.pose.t), atol=1e-4)
        np.testing.assert_allclose(
            np.abs(np.asarray(eng.trajectory[kf.index].q)),
            np.abs(np.asarray(kf.pose.q)), atol=1e-5)
