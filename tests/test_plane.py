"""Point-to-plane objective tests: normals, solver, and the accuracy win
over point-to-point on rendered (differently-sampled) pairs."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu import (
    Correspondence,
    ICPConfig,
    ICPParams,
    Objective,
    RotationMode,
    Weighting,
    register,
)
from icp_tpu.icp.plane import solve_point_to_plane
from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
from icp_tpu.ops.normals import grid_normals
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.sensors import synthetic
from icp_tpu.slam import se3


def test_grid_normals_on_wall():
    """A frontal wall's landmark normals must be ~(0, 0, -1)."""
    scene = synthetic.wall_scene()
    lms = get_landmarks(
        synthetic.render_cloud(scene, synthetic.CameraPose.identity())
        .reshape(-1, 8))
    n = np.asarray(grid_normals(lms))
    valid = np.abs(n).sum(1) > 0
    assert valid.mean() > 0.95
    np.testing.assert_allclose(n[valid], [[0, 0, -1.0]] * valid.sum(),
                               atol=1e-3)


def test_grid_normals_on_sphere(rng):
    """Sphere-surface normals must point from center to surface (outward,
    i.e. toward the camera for the front hemisphere)."""
    scene = synthetic.Scene(
        planes=jnp.zeros((0, 4), jnp.float32),
        spheres=jnp.array([[0.0, 0.0, 1500.0, 400.0]], jnp.float32))
    lms = get_landmarks(
        synthetic.render_cloud(scene, synthetic.CameraPose.identity())
        .reshape(-1, 8))
    n = np.asarray(grid_normals(lms))
    pts = np.asarray(lms[:, :3])
    hit = np.abs(pts).sum(1) > 0
    valid = (np.abs(n).sum(1) > 0) & hit
    expected = pts[valid] - np.array([0, 0, 1500.0])
    expected /= np.linalg.norm(expected, axis=1, keepdims=True)
    dots = (n[valid] * expected).sum(1)
    assert np.quantile(dots, 0.1) > 0.9  # aligned outward


def test_plane_solver_exact_on_plane_constraints(rng):
    """Points on a plane displaced along its normal: the solver must recover
    the normal-direction translation exactly (tangential is unconstrained
    and must be ~0 thanks to damping)."""
    n = np.array([0.0, 0.0, 1.0], np.float32)
    pts = np.zeros((100, 3), np.float32)
    pts[:, 0] = rng.uniform(-100, 100, 100)
    pts[:, 1] = rng.uniform(-100, 100, 100)
    moved = pts + np.array([0, 0, 5.0], np.float32)  # moving is 5mm above
    normals = np.tile(n, (100, 1))
    qk, tk = solve_point_to_plane(jnp.asarray(moved), jnp.asarray(pts),
                                  jnp.asarray(normals))
    assert abs(float(tk[2]) + 5.0) < 1e-3  # pulls moving back onto the plane
    assert float(qangle_deg(qk)) < 0.05


def test_symmetric_plane_at_least_as_good(rng):
    """The symmetric (averaged-normal) variant must be at least as accurate
    as one-sided point-to-plane and converge at least as fast."""
    import dataclasses

    scene = synthetic.default_scene()
    A = synthetic.CameraPose.identity()
    q = np.array([0, np.sin(0.004), 0, np.cos(0.004)], np.float32)
    t = np.array([12.0, -7.0, 9.0], np.float32)
    B = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    la = get_landmarks(synthetic.render_cloud(scene, A).reshape(-1, 8))
    lb = get_landmarks(synthetic.render_cloud(scene, B).reshape(-1, 8))
    rel = se3.relative(A, B)
    params = ICPParams(alpha=2e2).as_f32()
    base = ICPConfig(estimate_scale=False, objective=Objective.PLANE,
                     max_iterations=40)

    def run(sym):
        st = register(la, lb, params,
                      dataclasses.replace(base, plane_symmetric=sym))
        return float(jnp.linalg.norm(st.t - rel.t)), int(st.k)

    t_one, k_one = run(False)
    t_sym, k_sym = run(True)
    assert t_sym < 1.0
    assert t_sym <= t_one * 1.2  # never meaningfully worse
    assert k_sym <= k_one + 1


@pytest.mark.parametrize("correspondence",
                         [Correspondence.RBC, Correspondence.BRUTE])
def test_plane_beats_point_on_rendered_pair(rng, correspondence):
    """On differently-sampled rendered pairs, PLANE must land far closer to
    the ground truth than POINT's few-mm lattice floor."""
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
        t_err = float(jnp.linalg.norm(st.t - rel.t))
        a_err = float(qangle_deg(qmul(st.q, qconj(rel.q))))
        return t_err, a_err

    t_point, a_point = err(Objective.POINT)
    t_plane, a_plane = err(Objective.PLANE)
    assert t_plane < 1.0, (t_plane, t_point)  # sub-mm
    assert a_plane < 0.04, (a_plane, a_point)
    assert t_plane < t_point * 0.5
