"""Viz smoke tests (matplotlib Agg backend; files must exist and be PNG)."""

import numpy as np
import pytest

mpl = pytest.importorskip("matplotlib")

from icp_tpu.viz import plot_cloud, plot_registration, plot_trajectory
from tests.utils import make_cloud8


def _is_png(path):
    with open(path, "rb") as f:
        return f.read(8) == b"\x89PNG\r\n\x1a\n"


def test_plot_cloud(tmp_path, rng):
    p = str(tmp_path / "cloud.png")
    plot_cloud(make_cloud8(rng, 500), p, title="test")
    assert _is_png(p)


def test_plot_registration(tmp_path, rng):
    f = make_cloud8(rng, 300)
    m = make_cloud8(rng, 300)
    t = m.copy()
    t[:, :3] += 5.0
    p = str(tmp_path / "reg.png")
    plot_registration(f, m, t, p)
    assert _is_png(p)


def test_plot_trajectory(tmp_path, rng):
    est = [rng.normal(size=3) * 10 for _ in range(8)]
    gt = [e + rng.normal(size=3) for e in est]
    p = str(tmp_path / "traj.png")
    plot_trajectory(est, gt, p)
    assert _is_png(p)


def test_plot_cloud_skips_invalid(tmp_path, rng):
    cloud = make_cloud8(rng, 100)
    cloud[:50] = 0.0  # invalid points dropped, not plotted
    p = str(tmp_path / "c2.png")
    plot_cloud(cloud, p)
    assert _is_png(p)

def test_live_viewer_headless_stream(tmp_path, rng):
    """LiveViewer on Agg: frames stream to PNG files; attach() + step()
    drive a real ICPStepByStep (the reference's T key)."""
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.pipeline import ICPStepByStep
    from icp_tpu.sensors import synthetic
    from icp_tpu.viz import LiveViewer

    scene = synthetic.default_scene()
    a = synthetic.render_cloud(scene, synthetic.CameraPose.identity())
    q = np.array([0, 0.004, 0, 1.0], np.float32)
    q /= np.linalg.norm(q)
    b_pose = synthetic.CameraPose(
        jnp.asarray(q), jnp.asarray(np.array([8.0, -4.0, 3.0], np.float32)))
    b = synthetic.render_cloud(scene, b_pose)

    app = ICPStepByStep(a, b, ICPParams(alpha=2e2),
                        ICPConfig(estimate_scale=False))
    out = str(tmp_path / "live")
    v = LiveViewer(out_dir=out, max_points=500)
    assert not v.interactive  # Agg in tests
    v.attach(app)
    v.step()
    v.step()
    v.close()
    import os

    frames = sorted(os.listdir(out))
    assert frames == ["frame_0000.png", "frame_0001.png", "frame_0002.png"]
    assert _is_png(os.path.join(out, frames[-1]))
    assert int(app.state.k) == 2  # steps actually drove the registration
