"""End-to-end convergence tests: synthetic pairs with known ground-truth
transforms must be recovered — the coverage gap SURVEY.md §4 calls out in the
reference (it has no integration test; the bundled clouds served that role
manually)."""

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
from icp_tpu.icp.quaternion import qmul, qconj, qangle_deg, qrotate, transform_points
from tests.utils import make_cloud8, random_quat


def _structured_cloud(rng, n):
    """A cloud with geometric + photometric structure (not pure noise): a
    wavy surface with a color gradient, sampled at RANDOM (u, v) — a regular
    grid would carry a discrete translational symmetry that point-to-point
    ICP can lock onto one lattice step off the truth."""
    u = rng.uniform(-400, 400, n)
    v = rng.uniform(-300, 300, n)
    z = 1500 + 80 * np.sin(u / 90.0) + 60 * np.cos(v / 70.0)
    xyz = np.stack([u, v, z], -1)
    rgb = np.stack([
        0.5 + 0.5 * np.sin(u / 40.0), 0.5 + 0.5 * np.cos(v / 55.0),
        np.clip((z - 1350) / 300.0, 0, 1),
    ], -1)
    out = np.ones((n, 8), np.float32)
    out[:, :3] = xyz
    out[:, 4:7] = rgb
    return out.astype(np.float32)


def _make_pair(rng, n, angle=0.03, trans=15.0):
    """fixed = R(q_true) * moving + t_true (exact correspondences).

    moving = R^-1 (fixed - t) = qrotate(q*, fixed) - qrotate(q*, t).
    """
    fixed = _structured_cloud(rng, n)
    q_true = random_quat(rng, angle)
    t_true = (rng.normal(size=3) * trans).astype(np.float32)
    q_inv = qconj(jnp.asarray(q_true))
    t_inv = -qrotate(q_inv, jnp.asarray(t_true))
    moving = np.asarray(transform_points(jnp.asarray(fixed), q_inv, t_inv,
                                         jnp.float32(1.0)))
    return fixed, moving, q_true, t_true


@pytest.mark.parametrize("rotation", [RotationMode.POWER, RotationMode.SVD,
                                      RotationMode.JACOBI])
@pytest.mark.parametrize("weighting", [Weighting.REGULAR, Weighting.WEIGHTED])
def test_register_brute_recovers_transform(rng, rotation, weighting):
    fixed, moving, q_true, t_true = _make_pair(rng, 1024)
    config = ICPConfig(m=1024, n_r=16, rotation=rotation, weighting=weighting,
                       correspondence=Correspondence.BRUTE, max_iterations=40)
    params = ICPParams().as_f32()
    state = register(jnp.asarray(fixed), jnp.asarray(moving), params, config)

    # Residual rotation between estimate and truth, in degrees.
    q_err = qmul(state.q, qconj(jnp.asarray(q_true)))
    assert float(qangle_deg(q_err)) < 0.1
    np.testing.assert_allclose(np.asarray(state.t), t_true, atol=1.0)
    assert abs(float(state.s) - 1.0) < 1e-3
    assert int(state.k) <= 40


def test_register_rbc_recovers_transform(rng):
    fixed, moving, q_true, t_true = _make_pair(rng, 4096)
    config = ICPConfig(m=4096, n_r=64, rotation=RotationMode.POWER,
                       weighting=Weighting.WEIGHTED,
                       correspondence=Correspondence.RBC, max_iterations=40)
    params = ICPParams(alpha=2e2).as_f32()
    state = register(jnp.asarray(fixed), jnp.asarray(moving), params, config)

    q_err = qmul(state.q, qconj(jnp.asarray(q_true)))
    assert float(qangle_deg(q_err)) < 0.1
    np.testing.assert_allclose(np.asarray(state.t), t_true, atol=1.5)
    assert abs(float(state.s) - 1.0) < 2e-3


def test_register_identity_pair_converges_fast(rng):
    fixed = _structured_cloud(rng, 1024)
    config = ICPConfig(m=1024, n_r=16, correspondence=Correspondence.BRUTE,
                       rotation=RotationMode.POWER, weighting=Weighting.REGULAR)
    params = ICPParams().as_f32()
    state = register(jnp.asarray(fixed), jnp.asarray(fixed), params, config)
    # Identical clouds: first increment is ~identity -> stops at k=1.
    assert int(state.k) <= 2
    assert float(qangle_deg(state.q)) < 1e-3
    assert float(jnp.linalg.norm(state.t)) < 1e-2


def test_register_with_invalid_points(rng):
    """Zero-geometry (invalid Kinect) points must pass through the samplers
    and be absorbed by the weighting, like the reference (getLMs picks them;
    kernels/icp_kernels.cl:50-51)."""
    fixed, moving, q_true, t_true = _make_pair(rng, 4096)
    fixed = np.array(fixed)
    moving = np.array(moving)
    # Punch holes: 10% invalid points in each cloud (zero geometry+color).
    for arr in (fixed, moving):
        idx = rng.choice(arr.shape[0], arr.shape[0] // 10, replace=False)
        arr[idx] = 0.0
    config = ICPConfig(m=4096, n_r=64, rotation=RotationMode.POWER,
                       weighting=Weighting.WEIGHTED,
                       correspondence=Correspondence.RBC,
                       estimate_scale=False, max_iterations=40)
    state = register(jnp.asarray(fixed), jnp.asarray(moving),
                     ICPParams(alpha=2e2).as_f32(), config)
    q_err = qmul(state.q, qconj(jnp.asarray(q_true)))
    # The invalid-pair discard in icp_step keeps accuracy near the clean
    # case (without it, the origin-clustered invalid matches drag t by
    # ~7 mm).
    assert float(qangle_deg(q_err)) < 0.2
    np.testing.assert_allclose(np.asarray(state.t), t_true, atol=2.0)
    assert np.isfinite(np.asarray(state.T)).all()


def test_invalid_points_large_translation_regular(rng):
    """Regression: invalid-point validity must come from the ORIGINAL
    coordinates. A transformed invalid point sits at exactly t (not 0), so
    a transformed-geometry check stops filtering after iteration 1 —
    REGULAR weighting + large t + many holes is the adversarial regime."""
    fixed, moving, q_true, t_true = _make_pair(rng, 4096, angle=0.02,
                                               trans=40.0)
    fixed = np.array(fixed)
    moving = np.array(moving)
    for arr in (fixed, moving):
        idx = rng.choice(arr.shape[0], arr.shape[0] // 5, replace=False)
        arr[idx] = 0.0
    config = ICPConfig(m=4096, n_r=64, weighting=Weighting.REGULAR,
                       estimate_scale=False, max_iterations=40)
    state = register(jnp.asarray(fixed), jnp.asarray(moving),
                     ICPParams(alpha=2e2).as_f32(), config)
    q_err = qmul(state.q, qconj(jnp.asarray(q_true)))
    assert float(qangle_deg(q_err)) < 0.1
    np.testing.assert_allclose(np.asarray(state.t), t_true, atol=2.0)


def test_run_respects_max_iterations(rng):
    fixed, moving, *_ = _make_pair(rng, 1024, angle=0.3, trans=100.0)
    config = ICPConfig(m=1024, n_r=16, correspondence=Correspondence.BRUTE,
                       rotation=RotationMode.POWER, weighting=Weighting.REGULAR,
                       max_iterations=3)
    params = ICPParams(angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()  # never converge
    state = register(jnp.asarray(fixed), jnp.asarray(moving), params, config)
    assert int(state.k) == 3


def test_wavy_surface_pair_contract(rng):
    """The shared scaled-gate generator (sensors.synthetic.wavy_surface_pair,
    bench.py's 4x/16x/lidar accuracy gates) follows the register()
    convention: two independent samplings under a known rigid transform,
    recovered by PLANE registration to well under the gate bounds."""
    from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
    from icp_tpu.sensors.synthetic import wavy_surface_pair

    fixed, moving, q_gt, t_gt = wavy_surface_pair(8192)
    config = ICPConfig(m=8192, n_r=128, objective=Objective.PLANE,
                       normal_mode="knn", estimate_scale=False)
    st = register(jnp.asarray(fixed), jnp.asarray(moving),
                  ICPParams(alpha=2e2).as_f32(), config)
    assert np.linalg.norm(np.asarray(st.t) - t_gt) < 0.5
    assert float(qangle_deg(qmul(st.q, qconj(jnp.asarray(q_gt))))) < 0.05
