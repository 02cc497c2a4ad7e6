"""TUM RGB-D format: write a synthetic sequence, read it back, run SLAM."""

import numpy as np
import jax.numpy as jnp
import pytest

pytest.importorskip("PIL")

from icp_tpu import ICPConfig, ICPParams
from icp_tpu.sensors import synthetic, tum
from icp_tpu.slam.mapping import SlamEngine
from icp_tpu.slam.odometry import KeyframePolicy


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("tum_seq"))
    tum.write_synthetic_sequence(root, n_frames=3)
    return root


def test_roundtrip_structure(seq_dir):
    seq = tum.load_sequence(seq_dir)
    assert len(seq) == 3
    assert seq.gt_t is not None and seq.gt_t.shape == (3, 3)
    assert seq.gt_q is not None
    # Frame 0 gt is identity-ish (trajectory starts at origin).
    np.testing.assert_allclose(seq.gt_t[0], 0.0, atol=1e-6)


def test_cloud_loading_matches_render(seq_dir):
    """A loaded TUM cloud must agree with the direct render (up to PNG
    quantization) when loaded with the renderer's f=595 intrinsics."""
    seq = tum.load_sequence(seq_dir)
    cloud = tum.load_cloud(seq.rgb_files[0], seq.depth_files[0],
                           fx=595.0, fy=595.0)
    assert cloud.shape == (480, 640, 8)

    scene = synthetic.default_scene()
    direct = np.asarray(synthetic.render_cloud(
        scene, synthetic.CameraPose.identity()))
    valid = direct[..., 2] > 0
    # Depth quantization: 1/5000 m = 0.2 mm.
    np.testing.assert_allclose(cloud[valid][:, 2], direct[valid][:, 2],
                               atol=0.5)
    np.testing.assert_allclose(cloud[valid][:, :2], direct[valid][:, :2],
                               atol=1.0)
    np.testing.assert_allclose(cloud[valid][:, 4:7], direct[valid][:, 4:7],
                               atol=1.0 / 255 + 1e-3)


def test_associate_one_to_one():
    """A dropped depth frame must not duplicate its neighbor (standard
    associate.py uniqueness)."""
    rgb = [(0.000, "r0"), (0.033, "r1"), (0.066, "r2")]
    depth = [(0.016, "d0"), (0.067, "d2")]  # depth for frame 1 dropped
    out = tum._associate(rgb, depth, max_dt=0.02)
    matched_depth = [o[2] for o in out]
    assert len(matched_depth) == len(set(matched_depth))  # no duplicates
    assert ("r2" in [o[1] for o in out])  # best |dt| pair survives


def test_associate_nearest_not_ceiling():
    rgb = [(10.011, "r")]
    depth = [(10.010, "lo"), (10.020, "hi")]
    out = tum._associate(rgb, depth, max_dt=0.02)
    assert out[0][2] == "lo"  # nearest, not first-greater


def test_degenerate_inputs(tmp_path):
    root = str(tmp_path)
    with open(f"{root}/rgb.txt", "w") as f:
        f.write("# only comments\n1.0 rgb/a.png\n")
    with open(f"{root}/depth.txt", "w") as f:
        f.write("# empty\n")
    with open(f"{root}/groundtruth.txt", "w") as f:
        f.write("# no rows\n")
    seq = tum.load_sequence(root)
    assert len(seq) == 0
    assert seq.gt_t is None


def test_slam_on_tum_sequence(seq_dir):
    """End-to-end: TUM sequence -> SlamEngine -> trajectory near gt."""
    seq = tum.load_sequence(seq_dir)
    eng = SlamEngine(ICPParams(alpha=2e2),
                     ICPConfig(estimate_scale=False),
                     policy=KeyframePolicy(max_gap=2))
    for cloud in tum.sequence_clouds(seq, fx=595.0, fy=595.0):
        eng.process_frame(jnp.asarray(cloud))
    assert len(eng.trajectory) == 3
    # gt in meters; engine in mm.
    gt_mm = seq.gt_t * 1000.0
    err = np.linalg.norm(np.asarray(eng.trajectory[-1].t) - gt_mm[-1])
    assert err < 15.0, err


def test_evaluate_trajectory(seq_dir):
    """ATE/RPE of the SLAM trajectory on the synthetic TUM sequence must be
    small; a deliberately-drifted copy must score worse."""
    seq = tum.load_sequence(seq_dir)
    eng = SlamEngine(ICPParams(alpha=2e2),
                     ICPConfig(estimate_scale=False),
                     policy=KeyframePolicy(max_gap=2))
    for cloud in tum.sequence_clouds(seq, fx=595.0, fy=595.0):
        eng.process_frame(jnp.asarray(cloud))
    est_q = np.stack([np.asarray(p.q) for p in eng.trajectory])
    est_t = np.stack([np.asarray(p.t) for p in eng.trajectory])

    ate, rpe_t, rpe_r = tum.evaluate_trajectory(seq, est_q, est_t)
    assert ate < 0.02       # meters
    assert rpe_t < 0.02
    assert rpe_r < 1.0      # degrees

    drifted = est_t + np.arange(len(est_t))[:, None] * 50.0  # 50 mm/frame
    ate2, rpe2, _ = tum.evaluate_trajectory(seq, est_q, drifted)
    assert ate2 > ate and rpe2 > rpe_t

    import pytest
    with pytest.raises(ValueError):
        tum.evaluate_trajectory(
            tum.TumSequence(root=seq.root, rgb_files=[], depth_files=[],
                            timestamps=[]),
            est_q, est_t)
