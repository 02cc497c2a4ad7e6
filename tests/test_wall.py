"""Flat-wall (photometric-stress) registration regime tests.

The reference's kg_pc8d_wall dataset exercises registration where geometry
is degenerate (one frontal plane) and the photometric term must carry the
in-plane DOF (data/README.md: "shrinking alpha degrades it"). The honest
physics of alpha-blended 8-D NN matching at the reference's landmark pitch
(~13 mm on a wall at 2 m):

  * the wall-normal direction and the rotation are recovered essentially
    exactly (geometry constrains them);
  * in-plane translation BELOW the landmark pitch is unrecoverable by
    construction: the identity lattice match (geometric distance ~0) beats
    the true correspondence (distance ~pitch^2) at any reasonable alpha;
  * the photometric term biases matching for motions at or above the
    pitch, bounding the drift rather than eliminating it.

These tests pin down exactly that contract.
"""

import numpy as np
import jax.numpy as jnp

from icp_tpu import ICPConfig, ICPParams, Objective, register
from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul, qrotate
from icp_tpu.ops.sampling import get_landmarks
from icp_tpu.sensors import pinhole, synthetic
from icp_tpu.slam import se3

_WALL = synthetic.wall_scene()


def _wall_cloud(pose):
    """Wall render with a strong world-anchored texture (the photometric
    signal source)."""
    depth, _ = synthetic.render(_WALL, pose)
    cloud = pinhole.backproject(depth, jnp.zeros(depth.shape + (3,)))
    xyz = jnp.asarray(np.asarray(cloud[..., :3]))
    world = qrotate(pose.q, xyz) + pose.t
    xw = np.asarray(world[..., 0])
    yw = np.asarray(world[..., 1])
    c = np.asarray(cloud).copy()
    c[..., 4] = 0.5 + 0.5 * np.sin(xw / 35.0)
    c[..., 5] = 0.5 + 0.5 * np.cos(yw / 28.0)
    c[..., 6] = 0.5 + 0.5 * np.sin((xw + yw) / 50.0)
    return jnp.asarray(c)


def test_wall_normal_direction_and_rotation_exact():
    """z (wall normal) and rotation recover to high accuracy on a pure
    wall; in-plane drift stays bounded by ~2x the landmark pitch."""
    A = synthetic.CameraPose.identity()
    th = 0.006
    q = np.array([0, np.sin(th / 2), 0, np.cos(th / 2)], np.float32)
    t = np.array([10.0, -5.0, 4.0], np.float32)
    B = synthetic.CameraPose(jnp.asarray(q), jnp.asarray(t))
    la = get_landmarks(_wall_cloud(A).reshape(-1, 8))
    lb = get_landmarks(_wall_cloud(B).reshape(-1, 8))
    rel = se3.relative(A, B)

    config = ICPConfig(estimate_scale=False, max_iterations=60)
    st = register(la, lb, ICPParams(alpha=1e3).as_f32(), config)

    q_err = qmul(st.q, qconj(rel.q))
    assert float(qangle_deg(q_err)) < 0.01
    assert abs(float(st.t[2]) - float(rel.t[2])) < 0.5  # normal direction
    # In-plane: bounded, not exact (see module docstring).
    lateral = np.linalg.norm(np.asarray(st.t[:2]) - np.asarray(rel.t[:2]))
    assert lateral < 30.0, lateral


def test_wall_plane_objective_normal_exact():
    """PLANE mode on a wall: normal direction to ~1e-2 mm, rotation to
    ~1e-3 deg (the plane constraint is exact there)."""
    A = synthetic.CameraPose.identity()
    t = np.array([4.0, -2.0, 5.0], np.float32)
    B = synthetic.CameraPose(
        jnp.asarray(np.array([0, 0, 0, 1], np.float32)), jnp.asarray(t))
    la = get_landmarks(_wall_cloud(A).reshape(-1, 8))
    lb = get_landmarks(_wall_cloud(B).reshape(-1, 8))

    config = ICPConfig(estimate_scale=False, objective=Objective.PLANE,
                       max_iterations=60)
    st = register(la, lb, ICPParams(alpha=1e3).as_f32(), config)
    assert abs(float(st.t[2]) - 5.0) < 0.05
    assert float(qangle_deg(st.q)) < 0.01
