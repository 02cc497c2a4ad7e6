"""Distributed (dp-sharded) bundle adjustment vs the single-device solver."""

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.parallel.mesh import make_mesh
from icp_tpu.slam.bundle_adjustment import (
    BAProblem,
    ba_cost,
    ba_solve,
    make_sharded_ba,
)
from tests.test_bundle_adjustment import _make_problem


def _localize(problem: BAProblem, n_shards: int) -> BAProblem:
    """Reorder so landmarks (and their observations) are contiguous per
    shard with LOCAL obs_point indices — the make_sharded_ba contract."""
    L = problem.points.shape[0]
    assert L % n_shards == 0
    l_per = L // n_shards
    obs_pt = np.asarray(problem.obs_point)
    order = np.argsort(obs_pt, kind="stable")
    # observations sorted by landmark -> contiguous landmark blocks
    obs_cam = np.asarray(problem.obs_cam)[order]
    obs_z = np.asarray(problem.obs_z)[order]
    obs_w = np.asarray(problem.obs_w)[order]
    obs_pt_sorted = obs_pt[order]
    local_pt = obs_pt_sorted % l_per
    return problem._replace(
        obs_cam=jnp.asarray(obs_cam),
        obs_point=jnp.asarray(local_pt.astype(np.int32)),
        obs_z=jnp.asarray(obs_z),
        obs_w=jnp.asarray(obs_w),
    )


def test_sharded_ba_matches_single_device(rng):
    problem, gt_poses, pts = _make_problem(rng, n_cams=4, n_pts=48,
                                           perturb=0.01)
    single = ba_solve(problem, iterations=6)
    assert float(ba_cost(single)) < float(ba_cost(problem)) * 1e-3

    mesh = make_mesh(8, 1)
    run = make_sharded_ba(mesh, n_cams=4, iterations=6)
    local = _localize(problem, 8)
    out = jax.block_until_ready(run(local))

    np.testing.assert_allclose(np.asarray(out.pose_t),
                               np.asarray(single.pose_t), atol=5e-2)
    # Points come back in shard-block order == original (landmarks were
    # already contiguous in _make_problem's construction order).
    np.testing.assert_allclose(np.asarray(out.points),
                               np.asarray(single.points), atol=5e-2)
