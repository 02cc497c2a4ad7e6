"""Sensor-layer tests: pinhole model, synthetic renderer, guided filter, IO."""

import numpy as np
import jax.numpy as jnp

from icp_tpu.sensors import guided_filter as gf
from icp_tpu.sensors import pinhole, synthetic
from icp_tpu.sensors.io import read_cloud_bin, write_cloud_bin, write_ply
from icp_tpu.slam.se3 import Pose, apply as pose_apply
from tests.utils import make_cloud8


def test_backproject_matches_reference_formula(rng):
    depth = rng.uniform(800, 2500, (480, 640)).astype(np.float32)
    rgb = rng.uniform(0, 1, (480, 640, 3)).astype(np.float32)
    cloud = np.asarray(pinhole.backproject(jnp.asarray(depth), jnp.asarray(rgb)))
    u, v = 123, 456
    d = depth[v, u]
    # reference src/kinect_frame_grabber.cpp:246-264: x=(u-319.5)d/595 ...
    assert abs(cloud[v, u, 0] - (u - 319.5) * d / 595.0) < 1e-2
    assert abs(cloud[v, u, 1] - (v - 239.5) * d / 595.0) < 1e-2
    assert cloud[v, u, 2] == d
    assert cloud[v, u, 3] == 1.0 and cloud[v, u, 7] == 1.0
    np.testing.assert_allclose(cloud[v, u, 4:7], rgb[v, u], atol=1e-6)


def test_backproject_project_roundtrip(rng):
    depth = rng.uniform(800, 2500, (480, 640)).astype(np.float32)
    rgb = rng.uniform(0, 1, (480, 640, 3)).astype(np.float32)
    cloud = pinhole.backproject(jnp.asarray(depth), jnp.asarray(rgb))
    u, v, z = pinhole.project(cloud.reshape(-1, 8))
    uu, vv = np.meshgrid(np.arange(640), np.arange(480))
    np.testing.assert_allclose(np.asarray(u).reshape(480, 640), uu, atol=1e-2)
    np.testing.assert_allclose(np.asarray(v).reshape(480, 640), vv, atol=1e-2)


def test_render_hits_scene(rng):
    scene = synthetic.default_scene()
    depth, rgb = synthetic.render(scene, synthetic.CameraPose.identity())
    depth = np.asarray(depth)
    rgb = np.asarray(rgb)
    assert depth.shape == (480, 640)
    # Center pixel should hit something in front of the camera.
    assert 800 < depth[240, 320] < 2500
    # Most of the frame hits the wall/floor/spheres.
    assert (depth > 0).mean() > 0.9
    assert rgb.min() >= 0 and rgb.max() <= 1


def test_render_depth_consistent_with_geometry():
    """A wall-only scene viewed head-on must give depth == wall distance at
    the optical center and the exact plane equation everywhere."""
    scene = synthetic.Scene(
        planes=jnp.array([[0.0, 0.0, -1.0, -2000.0]], jnp.float32),
        spheres=jnp.zeros((0, 4), jnp.float32),
    )
    depth, _ = synthetic.render(scene, synthetic.CameraPose.identity())
    np.testing.assert_allclose(np.asarray(depth), 2000.0, rtol=1e-5)


def test_render_cloud_pair_ground_truth_transform(rng):
    """Two renders of the same scene from different poses: transforming
    frame B's cloud by A_from_B must land on scene surfaces seen by A.

    Check via the known wall plane: points on the wall (z=2200 world) from
    either camera, when mapped to world, satisfy the plane equation."""
    scene = synthetic.Scene(
        planes=jnp.array([[0.0, 0.0, -1.0, -2200.0]], jnp.float32),
        spheres=jnp.zeros((0, 4), jnp.float32),
    )
    q = jnp.asarray(np.array([0, np.sin(0.01), 0, np.cos(0.01)], np.float32))
    t = jnp.asarray(np.array([30.0, -10.0, 20.0], np.float32))
    pose_b = synthetic.CameraPose(q, t)
    cloud_b = np.asarray(synthetic.render_cloud(scene, pose_b)).reshape(-1, 8)
    valid = cloud_b[:, 2] > 0
    pts_world = np.asarray(
        pose_apply(Pose(q, t), jnp.asarray(cloud_b[valid, :3])))
    np.testing.assert_allclose(pts_world[:, 2], 2200.0, atol=0.5)


def test_box_filter_constant_preserved():
    x = jnp.full((64, 64), 3.5)
    out = np.asarray(gf.box_filter(x, 5))
    np.testing.assert_allclose(out, 3.5, rtol=1e-6)


def test_guided_filter_smooths_noise(rng):
    clean = np.tile(np.linspace(0, 1, 64, dtype=np.float32), (64, 1))
    noisy = clean + rng.normal(0, 0.05, clean.shape).astype(np.float32)
    out = np.asarray(gf.guided_filter(jnp.asarray(noisy), jnp.asarray(noisy),
                                      radius=5, eps=0.01))
    assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean() * 0.6


def test_guided_filter_preserves_edges():
    step = np.zeros((64, 64), np.float32)
    step[:, 32:] = 1.0
    out = np.asarray(gf.guided_filter(jnp.asarray(step), jnp.asarray(step),
                                      radius=5, eps=1e-4))
    # Edge magnitude survives (within 10%).
    assert out[:, 40].mean() - out[:, 24].mean() > 0.9


def test_filter_depth_keeps_invalid_zero(rng):
    d = rng.uniform(800, 1200, (32, 32)).astype(np.float32)
    d[5:10, 5:10] = 0.0
    out = np.asarray(gf.filter_depth(jnp.asarray(d)))
    assert (out[5:10, 5:10] == 0).all()


def test_cloud_bin_roundtrip(tmp_path, rng):
    cloud = make_cloud8(rng, 1000)
    p = tmp_path / "cloud.bin"
    write_cloud_bin(p, cloud)
    back = read_cloud_bin(p)
    np.testing.assert_array_equal(back, cloud)
    assert p.stat().st_size == 1000 * 8 * 4


def test_write_ply(tmp_path, rng):
    cloud = make_cloud8(rng, 10)
    p = tmp_path / "cloud.ply"
    write_ply(p, cloud)
    text = p.read_text()
    assert "element vertex 10" in text
