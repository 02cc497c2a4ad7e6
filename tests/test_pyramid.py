"""Coarse-to-fine pyramid registration tests (large-motion robustness)."""

import numpy as np
import jax.numpy as jnp

from icp_tpu import ICPConfig, ICPParams, register
from icp_tpu.icp.pyramid import register_pyramid, subsample_grid
from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.sensors import synthetic
from icp_tpu.slam import se3


def test_subsample_grid_shapes(rng):
    from tests.utils import make_cloud8

    lms = make_cloud8(rng, 128 * 128)
    assert subsample_grid(jnp.asarray(lms), 1).shape == (16384, 8)
    assert subsample_grid(jnp.asarray(lms), 2).shape == (64 * 64, 8)
    assert subsample_grid(jnp.asarray(lms), 4).shape == (32 * 32, 8)


def test_pyramid_handles_large_motion():
    """A motion well outside the single-level basin (~landmark spacing)
    must be recovered by the pyramid and improved over single-level."""
    scene = synthetic.default_scene()
    A = synthetic.CameraPose.identity()
    th = 0.02
    q = np.array([0, np.sin(th / 2), 0, np.cos(th / 2)], np.float32)
    t = np.array([60.0, -30.0, 40.0], np.float32)
    B = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    la = get_landmarks(synthetic.render_cloud(scene, A).reshape(-1, 8))
    lb = get_landmarks(synthetic.render_cloud(scene, B).reshape(-1, 8))
    rel = se3.relative(A, B)

    config = ICPConfig(estimate_scale=False, max_iterations=40)
    params = ICPParams(alpha=2e2).as_f32()

    single = register(la, lb, params, config)
    pyr = register_pyramid(la, lb, params, config, strides=(4, 2, 1))

    def errs(st):
        return (float(jnp.linalg.norm(st.t - rel.t)),
                float(qangle_deg(qmul(st.q, qconj(rel.q)))))

    t_single, a_single = errs(single)
    t_pyr, a_pyr = errs(pyr)
    assert t_pyr < 10.0, (t_pyr, t_single)
    assert a_pyr < 0.3, (a_pyr, a_single)
    assert t_pyr <= t_single + 1.0  # never meaningfully worse


def test_pyramid_small_motion_parity():
    """On small motions the pyramid must match plain registration."""
    scene = synthetic.default_scene()
    A = synthetic.CameraPose.identity()
    q = np.array([0, np.sin(0.002), 0, np.cos(0.002)], np.float32)
    t = np.array([5.0, -3.0, 4.0], np.float32)
    B = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    la = get_landmarks(synthetic.render_cloud(scene, A).reshape(-1, 8))
    lb = get_landmarks(synthetic.render_cloud(scene, B).reshape(-1, 8))
    rel = se3.relative(A, B)

    config = ICPConfig(estimate_scale=False)
    params = ICPParams(alpha=2e2).as_f32()
    single = register(la, lb, params, config)
    pyr = register_pyramid(la, lb, params, config)
    assert (float(jnp.linalg.norm(pyr.t - rel.t))
            < float(jnp.linalg.norm(single.t - rel.t)) + 1.0)
