"""SE(3) utilities and odometry-chain tests (synthetic rendered sequence)."""

import numpy as np
import jax.numpy as jnp

from icp_tpu import Correspondence, ICPConfig, ICPParams, RotationMode, Weighting
from icp_tpu.slam import se3
from icp_tpu.slam.odometry import (
    KeyframePolicy,
    absolute_trajectory_error,
    run_odometry,
)
from icp_tpu.sensors import synthetic
from tests.utils import random_quat


def test_se3_compose_inverse(rng):
    a = se3.Pose(jnp.asarray(random_quat(rng, 1.0)),
                 jnp.asarray(rng.normal(size=3).astype(np.float32)))
    b = se3.Pose(jnp.asarray(random_quat(rng, 1.0)),
                 jnp.asarray(rng.normal(size=3).astype(np.float32)))
    ab = se3.compose(a, b)
    b2 = se3.compose(se3.inverse(a), ab)
    np.testing.assert_allclose(np.asarray(b2.t), np.asarray(b.t), atol=1e-5)
    assert min(np.linalg.norm(np.asarray(b2.q) - np.asarray(b.q)),
               np.linalg.norm(np.asarray(b2.q) + np.asarray(b.q))) < 1e-5


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=6).astype(np.float32) * 0.3
    p = se3.exp(jnp.asarray(xi))
    xi2 = np.asarray(se3.log(p))
    np.testing.assert_allclose(xi2, xi, atol=1e-5)


def test_se3_apply_matches_compose(rng):
    p = se3.Pose(jnp.asarray(random_quat(rng, 1.0)),
                 jnp.asarray(rng.normal(size=3).astype(np.float32)))
    pts = rng.normal(size=(10, 3)).astype(np.float32)
    out = np.asarray(se3.apply(p, jnp.asarray(pts)))
    R = np.asarray(se3.rotation_matrix(p))
    np.testing.assert_allclose(out, pts @ R.T + np.asarray(p.t), atol=1e-5)


def test_odometry_chain_device_matches_host_chain(rng):
    """The single-dispatch scan odometry chain must agree with the
    host-driven chain on the same frames."""
    import jax

    from icp_tpu.slam.odometry import odometry_chain_device, run_odometry

    scene = synthetic.default_scene()
    poses_gt = synthetic.orbit_trajectory(3, radius_mm=30.0, yaw_rad=0.02)
    frames = [synthetic.render_cloud(scene, p) for p in poses_gt]
    config = ICPConfig(estimate_scale=False, max_iterations=20)
    params = ICPParams(alpha=2e2).as_f32()

    host = run_odometry(frames, params, config)

    from icp_tpu.slam.odometry import frame_to_landmarks
    lms = jnp.stack([frame_to_landmarks(f) for f in frames])
    q, t, ks = jax.block_until_ready(
        jax.jit(lambda s: odometry_chain_device(s, params, config))(lms))

    assert q.shape == (3, 4) and t.shape == (3, 3)
    for i in range(3):
        np.testing.assert_allclose(np.asarray(t[i]),
                                   np.asarray(host.poses[i].t), atol=1e-2)


def test_odometry_chain_recovers_trajectory(rng):
    """Render a short synthetic sequence and chain ICP: the estimated
    world poses must track the ground-truth camera trajectory (config 3 of
    BASELINE.json, scaled down for CPU test time).

    Tolerance note: point-to-point photogeometric ICP at the reference's
    landmark density (~15 mm pitch on surfaces at 2 m) has a few-mm
    per-frame accuracy floor from correspondence discretization; the
    reference itself never quantifies this (no accuracy tests, SURVEY.md
    §4). Rigid mode (estimate_scale=False) avoids the frustum scale/t_z
    degeneracy."""
    scene = synthetic.default_scene()
    poses_gt = synthetic.orbit_trajectory(4, radius_mm=40.0, yaw_rad=0.03)
    frames = [synthetic.render_cloud(scene, p) for p in poses_gt]

    config = ICPConfig(m=16384, n_r=256,
                       rotation=RotationMode.POWER,
                       weighting=Weighting.WEIGHTED,
                       correspondence=Correspondence.RBC,
                       max_iterations=40,
                       estimate_scale=False)
    params = ICPParams(alpha=2e2).as_f32()
    result = run_odometry(frames, params, config,
                          policy=KeyframePolicy(max_gap=2))

    gt = [se3.Pose(p.q, p.t) for p in poses_gt]
    ate = absolute_trajectory_error(result.poses, gt)
    assert ate < 15.0, f"ATE {ate} mm too large"
    assert result.keyframes[0] == 0
    assert len(result.keyframes) >= 2  # max_gap=2 forces keyframes
    assert len(result.poses) == 4


def test_relative_pose_error(rng):
    """RPE on a perfect trajectory is 0; on a trajectory with one bad step
    it reflects that step's drift (and only over windows crossing it)."""
    from icp_tpu.slam.odometry import relative_pose_error
    from icp_tpu.slam import se3
    import jax.numpy as jnp

    gt = [se3.Pose.identity()]
    step = se3.Pose(jnp.asarray(np.array([0, 0, 0, 1.0], np.float32)),
                    jnp.asarray(np.array([10.0, 0, 0], np.float32)))
    for _ in range(9):
        gt.append(se3.compose(gt[-1], step))

    t_rpe, r_rpe = relative_pose_error(gt, gt, delta=1)
    assert t_rpe < 1e-5 and r_rpe < 1e-5

    # Inject 2 mm of extra drift on one step of the estimate.
    bad = se3.Pose(step.q, step.t + jnp.asarray(np.array([2.0, 0, 0],
                                                          np.float32)))
    est = [se3.Pose.identity()]
    for i in range(9):
        est.append(se3.compose(est[-1], bad if i == 4 else step))
    t_rpe, _ = relative_pose_error(est, gt, delta=1)
    # One of nine windows carries a 2 mm error -> RMS = 2/3.
    np.testing.assert_allclose(t_rpe, 2.0 / 3.0, rtol=1e-3)
    t_rpe5, _ = relative_pose_error(est, gt, delta=5)
    assert t_rpe5 > t_rpe  # all delta=5 windows crossing step 4 see it
