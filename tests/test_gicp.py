"""Generalized-ICP (plane-to-plane) objective tests: the batched 3x3
inverse, solver behavior in the isotropic and planar limits, rendered-pair
accuracy vs point-to-point, and sharded parity."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from icp_tpu import (
    Correspondence,
    ICPConfig,
    ICPParams,
    Objective,
    register,
)
from icp_tpu.icp.gicp import disk_covariance_sum, inv3x3, solve_gicp
from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.sensors import synthetic
from icp_tpu.slam import se3


def test_inv3x3_matches_linalg(rng):
    """Adjugate inverse == LAPACK inverse on random SPD batches."""
    A = rng.normal(size=(64, 3, 3)).astype(np.float32)
    M = A @ A.transpose(0, 2, 1) + 0.5 * np.eye(3, dtype=np.float32)
    got = np.asarray(inv3x3(jnp.asarray(M)))
    want = np.linalg.inv(M)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_disk_covariance_limits(rng):
    """Zero normals -> isotropic 2I; identical unit normals -> thin 2*eps
    eigenvalue along the normal."""
    eps = 1e-3
    z = jnp.zeros((1, 3), jnp.float32)
    M0 = np.asarray(disk_covariance_sum(z, z, eps))[0]
    np.testing.assert_allclose(M0, 2.0 * np.eye(3), atol=1e-6)

    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    M1 = np.asarray(disk_covariance_sum(n, n, eps))[0]
    np.testing.assert_allclose(M1[2, 2], 2 * eps, rtol=1e-4)
    np.testing.assert_allclose(M1[0, 0], 2.0, rtol=1e-6)


def test_gicp_isotropic_recovers_translation(rng):
    """With zero normals (C = I) the step is point-to-point GN: an exact
    translation offset must be recovered in one step."""
    pts = rng.uniform(-200, 200, (256, 3)).astype(np.float32)
    t = np.array([3.0, -2.0, 5.0], np.float32)
    zeros = jnp.zeros((256, 3), jnp.float32)
    qk, tk = solve_gicp(jnp.asarray(pts + t), jnp.asarray(pts),
                        zeros, zeros, jnp.float32(1e-3))
    np.testing.assert_allclose(np.asarray(tk), -t, atol=1e-3)
    assert float(qangle_deg(qk)) < 0.05


def test_gicp_planar_constrains_normal_direction(rng):
    """Coplanar points with plane normals, displaced along the normal: the
    normal component must be recovered; the tangential one is soft
    (weighted by eps) and must stay near zero under damping."""
    pts = np.zeros((256, 3), np.float32)
    pts[:, 0] = rng.uniform(-100, 100, 256)
    pts[:, 1] = rng.uniform(-100, 100, 256)
    moved = pts + np.array([0, 0, 5.0], np.float32)
    n = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32), (256, 1))
    qk, tk = solve_gicp(jnp.asarray(moved), jnp.asarray(pts), n, n,
                        jnp.float32(1e-3))
    assert abs(float(tk[2]) + 5.0) < 1e-3
    assert float(qangle_deg(qk)) < 0.05


@pytest.mark.parametrize("correspondence",
                         [Correspondence.RBC, Correspondence.BRUTE])
def test_gicp_beats_point_on_rendered_pair(rng, correspondence):
    """On differently-sampled rendered pairs GICP must, like PLANE, break
    the point-to-point lattice floor (sub-mm)."""
    scene = synthetic.default_scene()
    A = synthetic.CameraPose.identity()
    q = np.array([0, np.sin(0.004), 0, np.cos(0.004)], np.float32)
    t = np.array([12.0, -7.0, 9.0], np.float32)
    B = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    la = get_landmarks(synthetic.render_cloud(scene, A).reshape(-1, 8))
    lb = get_landmarks(synthetic.render_cloud(scene, B).reshape(-1, 8))
    rel = se3.relative(A, B)
    params = ICPParams(alpha=2e2).as_f32()

    def err(objective):
        config = ICPConfig(correspondence=correspondence,
                           objective=objective,
                           estimate_scale=False, max_iterations=40)
        st = register(la, lb, params, config)
        return (float(jnp.linalg.norm(st.t - rel.t)),
                float(qangle_deg(qmul(st.q, qconj(rel.q)))))

    t_point, _ = err(Objective.POINT)
    t_gicp, a_gicp = err(Objective.GICP)
    assert t_gicp < 1.0, (t_gicp, t_point)
    assert a_gicp < 0.04
    assert t_gicp < t_point * 0.5


def test_sharded_gicp_matches_single_device():
    """Sharded GICP matches the single-device result on an organized
    rendered pair (moving normals travel through the dp sharding)."""
    from icp_tpu.parallel.mesh import make_mesh
    from icp_tpu.parallel.sharded import make_sharded_register

    scene = synthetic.default_scene()
    A = synthetic.CameraPose.identity()
    q = np.array([0, np.sin(0.003), 0, np.cos(0.003)], np.float32)
    t = np.array([8.0, -5.0, 6.0], np.float32)
    B = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    la = get_landmarks(synthetic.render_cloud(scene, A).reshape(-1, 8))
    lb = get_landmarks(synthetic.render_cloud(scene, B).reshape(-1, 8))
    rel = se3.relative(A, B)

    config = ICPConfig(objective=Objective.GICP, estimate_scale=False,
                       correspondence=Correspondence.RBC, max_iterations=40)
    params = ICPParams(alpha=2e2).as_f32()
    single = register(la, lb, params, config)

    run = make_sharded_register(make_mesh(4, 2), config)
    sharded = jax.block_until_ready(run(la, lb, params))

    q_err = qmul(sharded.q, qconj(single.q))
    assert float(qangle_deg(q_err)) < 0.02
    np.testing.assert_allclose(np.asarray(sharded.t), np.asarray(single.t),
                               atol=0.3)
    assert float(jnp.linalg.norm(sharded.t - rel.t)) < 1.0
