"""Bundle-adjustment tests: synthetic multi-view problems with known optima."""

import numpy as np
import jax.numpy as jnp

from icp_tpu.slam import se3
from icp_tpu.slam.bundle_adjustment import BAProblem, ba_cost, ba_solve
from tests.utils import random_quat


def _make_problem(rng, n_cams=4, n_pts=50, noise=0.0, perturb=0.0):
    """Cameras on an arc observing a shared point cloud; observations from
    ground truth (+noise); initial estimate optionally perturbed."""
    gt_poses = []
    for i in range(n_cams):
        ang = 0.05 * i
        q = np.array([0, np.sin(ang / 2), 0, np.cos(ang / 2)], np.float32)
        t = np.array([80.0 * i, 5.0 * i, 20.0 * i], np.float32)
        gt_poses.append(se3.Pose(jnp.asarray(q), jnp.asarray(t)))

    pts = np.stack([
        rng.uniform(-500, 500, n_pts),
        rng.uniform(-400, 400, n_pts),
        rng.uniform(1200, 2200, n_pts),
    ], 1).astype(np.float32)

    obs_cam, obs_pt, obs_z = [], [], []
    for k, pose in enumerate(gt_poses):
        z = np.asarray(se3.apply(se3.inverse(pose), jnp.asarray(pts)))
        for l in range(n_pts):
            obs_cam.append(k)
            obs_pt.append(l)
            obs_z.append(z[l] + rng.normal(0, noise, 3))

    # Perturb initial estimates (not the anchored first camera).
    init_q, init_t = [], []
    for k, p in enumerate(gt_poses):
        if k == 0 or perturb == 0:
            init_q.append(p.q)
            init_t.append(p.t)
        else:
            xi = rng.normal(size=6).astype(np.float32) * perturb
            xi[:3] *= 30.0
            pp = se3.retract(p, jnp.asarray(xi))
            init_q.append(pp.q)
            init_t.append(pp.t)

    problem = BAProblem(
        pose_q=jnp.stack(init_q),
        pose_t=jnp.stack(init_t),
        points=jnp.asarray(pts + rng.normal(0, perturb * 100, pts.shape)
                           .astype(np.float32)),
        obs_cam=jnp.asarray(np.asarray(obs_cam, np.int32)),
        obs_point=jnp.asarray(np.asarray(obs_pt, np.int32)),
        obs_z=jnp.asarray(np.asarray(obs_z, np.float32)),
        obs_w=jnp.ones((len(obs_cam),), jnp.float32),
    )
    return problem, gt_poses, pts


def test_ba_perfect_initialization_stays(rng):
    problem, gt_poses, pts = _make_problem(rng)
    out = ba_solve(problem, iterations=3)
    np.testing.assert_allclose(np.asarray(out.pose_t),
                               np.asarray(problem.pose_t), atol=1e-2)
    np.testing.assert_allclose(np.asarray(out.points),
                               np.asarray(problem.points), atol=1e-2)


def test_ba_recovers_from_perturbation(rng):
    problem, gt_poses, pts = _make_problem(rng, perturb=0.01)
    c0 = float(ba_cost(problem))
    out = ba_solve(problem, iterations=8)
    c1 = float(ba_cost(out))
    assert c1 < c0 * 1e-3, (c0, c1)
    # Poses converge to ground truth (exact observations -> exact optimum).
    for k in range(1, 4):
        np.testing.assert_allclose(np.asarray(out.pose_t[k]),
                                   np.asarray(gt_poses[k].t), atol=0.5)
    np.testing.assert_allclose(np.asarray(out.points), pts, atol=0.5)


def test_ba_noisy_observations_reduce_cost(rng):
    problem, *_ = _make_problem(rng, noise=2.0, perturb=0.02)
    c0 = float(ba_cost(problem))
    out = ba_solve(problem, iterations=8)
    c1 = float(ba_cost(out))
    assert c1 < c0 * 0.5


def test_ba_anchor_fixed(rng):
    problem, *_ = _make_problem(rng, perturb=0.02)
    out = ba_solve(problem, iterations=5)
    np.testing.assert_allclose(np.asarray(out.pose_t[0]),
                               np.asarray(problem.pose_t[0]), atol=1e-3)


def test_ba_max_degree_overflow_raises(rng):
    """A landmark observed more than max_degree times must be rejected, not
    silently dropped from the Schur cross terms."""
    import pytest

    from icp_tpu.slam.bundle_adjustment import check_max_degree

    prob, *_ = _make_problem(rng, n_cams=3, n_pts=4)
    # All 12 observations hit point 0 -> degree 12 > max_degree 8.
    prob = prob._replace(obs_point=jnp.zeros_like(prob.obs_point))
    with pytest.raises(ValueError, match="max_degree"):
        ba_solve(prob, iterations=1, max_degree=8)
    assert check_max_degree(prob.obs_point, prob.points.shape[0], 12) == 12
