"""Native host-runtime tests (C++ codec + golden oracle vs JAX pipeline)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu.runtime import native
from tests.utils import make_cloud8


@pytest.fixture(scope="module")
def lib():
    lib = native.load()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_native_cloud_roundtrip(lib, tmp_path, rng):
    cloud = make_cloud8(rng, 2048)
    p = str(tmp_path / "c.bin")
    native.write_cloud(p, cloud)
    back = native.read_cloud(p, max_points=4096)
    np.testing.assert_array_equal(back, cloud)


def test_native_reads_python_written_file(lib, tmp_path, rng):
    from icp_tpu.sensors.io import write_cloud_bin

    cloud = make_cloud8(rng, 512)
    p = str(tmp_path / "c.bin")
    write_cloud_bin(p, cloud)
    back = native.read_cloud(p, max_points=512)
    np.testing.assert_array_equal(back, cloud)


def test_native_validate(lib, rng):
    cloud = make_cloud8(rng, 100)
    cloud[:10, :3] = 0.0  # invalid points
    assert native.validate_cloud(cloud) == 90
    bad = cloud.copy()
    bad[5, 2] = np.nan
    with pytest.raises(ValueError):
        native.validate_cloud(bad)


def test_native_nn_matches_jax(lib, rng):
    from icp_tpu.ops.distance import nearest_neighbor_brute

    q = make_cloud8(rng, 128)
    db = make_cloud8(rng, 256)
    idx_n, d_n = native.golden_nn(q, db, 150.0)
    idx_j, d_j = nearest_neighbor_brute(jnp.asarray(q), jnp.asarray(db),
                                        jnp.float32(150.0))
    np.testing.assert_array_equal(idx_n, np.asarray(idx_j))
    np.testing.assert_allclose(d_n, np.asarray(d_j), rtol=1e-4, atol=1.0)


def test_native_full_iteration_matches_icp_step(lib, rng):
    """Cross-implementation check of ONE FULL weighted ICP iteration:
    native C++ oracle (exact NN + golden Horn solve) vs the jitted
    icp_step (brute + weighted + power). Catches pipeline drift anywhere
    between search and accumulation."""
    from icp_tpu import Correspondence, ICPConfig, ICPParams, RotationMode, Weighting
    from icp_tpu.icp.state import identity_state
    from icp_tpu.icp.step import icp_step

    fixed = make_cloud8(rng, 512)
    moving = fixed.copy()
    moving[:, :3] += np.array([4.0, -2.0, 3.0], np.float32)
    moving[:, :3] += rng.normal(0, 0.5, (512, 3)).astype(np.float32)
    alpha = 150.0

    # Native oracle iteration.
    nn_idx, nn_d2 = native.golden_nn(moving, fixed, alpha)
    Tk = native.golden_solve(moving, fixed[nn_idx], nn_d2, weighted=True,
                             estimate_scale=True)

    # Framework iteration (same variant).
    config = ICPConfig(m=512, n_r=8, correspondence=Correspondence.BRUTE,
                       weighting=Weighting.WEIGHTED,
                       rotation=RotationMode.POWER)
    st = icp_step(identity_state(), jnp.asarray(moving), jnp.asarray(fixed),
                  ICPParams(alpha=alpha).as_f32(), config)
    got = np.concatenate([np.asarray(st.qk), np.asarray(st.tk),
                          [float(st.sk)]])
    np.testing.assert_allclose(got[:4], Tk[:4], atol=5e-4)
    np.testing.assert_allclose(got[4:7], Tk[4:7], atol=5e-2)
    assert abs(got[7] - Tk[7]) < 1e-4


def test_native_solve_matches_jax(lib, rng):
    """The native golden Horn solve must agree with the JAX solver on the
    same matched pairs."""
    from icp_tpu.icp.horn import solve_step_transform
    from icp_tpu.ops import moments

    fixed = make_cloud8(rng, 1024)
    moving = fixed.copy()
    # small rigid offset
    moving[:, :3] = moving[:, :3] + np.array([3.0, -2.0, 1.0], np.float32)
    d2 = ((fixed[:, :3] - moving[:, :3]) ** 2).sum(1).astype(np.float32)

    Tk = native.golden_solve(moving, fixed, d2, weighted=True,
                             estimate_scale=False)

    w = moments.compute_weights(jnp.asarray(d2))
    sw = moments.masked_weight_sum(w)
    mf, mm = moments.centroids(jnp.asarray(fixed), jnp.asarray(moving), w, sw)
    S11 = moments.s_matrix(jnp.asarray(moving[:, :3]) - mm,
                           jnp.asarray(fixed[:, :3]) - mf,
                           jnp.float32(1e-6), w)
    qk, tk, sk = solve_step_transform(S11, mf, mm, use_power=True,
                                      estimate_scale=False)
    np.testing.assert_allclose(Tk[:4], np.asarray(qk), atol=2e-4)
    np.testing.assert_allclose(Tk[4:7], np.asarray(tk), atol=2e-2)
    assert Tk[7] == 1.0


def test_frame_source_stream(tmp_path, rng):
    """Native prefetching frame source (and its numpy fallback) must
    stream a .bin sequence in sorted order with exact contents."""
    from icp_tpu.sensors.stream import FrameSource

    n = 256
    frames = []
    for i in range(5):
        cloud = rng.normal(size=(n, 8)).astype(np.float32)
        cloud.tofile(tmp_path / f"frame_{i:04d}.bin")
        frames.append(cloud)
    # A short (truncated) file must be zero-padded, not crash.
    frames[3][: n // 2].tofile(tmp_path / "frame_0003.bin")

    with FrameSource(str(tmp_path), n_points=n, ring=2) as src:
        assert len(src) == 5
        got = list(src)
    assert [i for i, _ in got] == [0, 1, 2, 3, 4]
    for (i, cloud), want in zip(got, frames):
        if i == 3:
            np.testing.assert_array_equal(cloud[: n // 2], want[: n // 2])
            assert np.all(cloud[n // 2:] == 0)
        else:
            np.testing.assert_array_equal(cloud, want)

    # Early close while the prefetch thread may still hold frames.
    src2 = FrameSource(str(tmp_path), n_points=n, ring=1)
    src2.next_frame()
    src2.close()


def test_frame_source_fallback(tmp_path, rng, monkeypatch):
    """Numpy fallback path (no native library) must stream identically."""
    from icp_tpu.runtime import native as _native
    from icp_tpu.sensors.stream import FrameSource

    n = 64
    want = rng.normal(size=(n, 8)).astype(np.float32)
    want.tofile(tmp_path / "only.bin")
    monkeypatch.setattr(_native, "load", lambda: None)
    with FrameSource(str(tmp_path), n_points=n) as src:
        assert src._handle is None  # really the fallback
        (idx, cloud), = list(src)
    assert idx == 0
    np.testing.assert_array_equal(cloud, want)
