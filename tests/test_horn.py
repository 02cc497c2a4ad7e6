"""Horn solver tests, including the reference's embedded cross-implementation
golden (testsICP.cpp:1008-1046: real S + means -> known SVD solution)."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu.icp import horn
from icp_tpu.icp import quaternion as Q
from tests.goldens import REF_MEANS, REF_S11, REF_SVD_TK, golden_s_matrix
from tests.utils import make_cloud8, random_quat

FLOAT_EPS = np.finfo(np.float32).eps


@pytest.mark.parametrize("use_power", ["power", "svd", "jacobi"])
def test_reference_golden_triplet(use_power):
    """Match the hard-coded SVD solution from the reference test within its
    own tolerance (42000 * eps, testsICP.cpp:1042-1052)."""
    qk, tk, sk = horn.solve_step_transform(
        jnp.asarray(REF_S11), jnp.asarray(REF_MEANS[0]), jnp.asarray(REF_MEANS[1]),
        mode=use_power,
    )
    got = np.concatenate([np.asarray(qk), np.asarray(tk), [float(sk)]])
    eps = 42000 * FLOAT_EPS  # ~0.005
    np.testing.assert_allclose(got, REF_SVD_TK, atol=eps)


@pytest.mark.parametrize("use_power", [True, False])
def test_recovers_known_rotation(rng, use_power):
    """S built from perfect correspondences of a known rotation must yield
    that rotation."""
    q_true = random_quat(rng, 0.4)
    t_true = rng.normal(size=3).astype(np.float32) * 20

    fixed = make_cloud8(rng, 512)
    # moving = R^-1 (fixed - t): then fixed = R moving + t.
    Rt = np.asarray(Q.quat_to_matrix(jnp.asarray(q_true)))
    moving = fixed.copy()
    moving[:, :3] = (fixed[:, :3] - t_true) @ Rt  # (R^T applied row-wise)

    mf = fixed[:, :3].mean(0)
    mm = moving[:, :3].mean(0)
    S11 = golden_s_matrix(moving[:, :3] - mm, fixed[:, :3] - mf, 1e-3)

    qk, tk, sk = horn.solve_step_transform(
        jnp.asarray(S11, dtype=jnp.float32), jnp.asarray(mf), jnp.asarray(mm),
        use_power=use_power,
    )
    qk = np.asarray(qk)
    if q_true[3] < 0:
        q_true = -q_true
    np.testing.assert_allclose(qk, q_true, atol=5e-4)
    np.testing.assert_allclose(np.asarray(tk), t_true, atol=0.5)
    assert abs(float(sk) - 1.0) < 1e-3


def test_power_negative_lambda_shift():
    """An S whose N has a dominant negative eigenvalue still must return the
    most-POSITIVE eigenvalue's eigenvector (reference shift-and-retry,
    kernels/icp_kernels.cl:1024-1037)."""
    # N = diag-ish with large negative eigenvalue: S = -a*I gives
    # N = diag(-a+2a', ...) — construct directly: S9 with Sxx=Syy=Szz=-5
    # gives N = diag(5, 5, 5, -15): dominant magnitude is -15 (eigvec e_w),
    # but the most positive eigenvalue is 5.
    S9 = np.zeros(9, np.float32)
    S9[0] = S9[4] = S9[8] = -5.0
    q = np.asarray(horn.solve_rotation_power(jnp.asarray(S9)))
    N = np.asarray(horn.build_N(jnp.asarray(S9)))
    lam = q @ N @ q
    evals = np.linalg.eigvalsh(N)
    assert abs(lam - evals.max()) < 1e-4


def test_svd_reflection_fix(rng):
    """A degenerate S that would produce det(VU^T) = -1 must still return a
    proper rotation (reference cpp:3479-3487)."""
    # Planar degenerate covariance with a reflection component.
    S9 = np.array([1.0, 0, 0, 0, 1.0, 0, 0, 0, -1.0], np.float32) * 1e-3
    q = np.asarray(horn.solve_rotation_svd(jnp.asarray(S9)))
    R = np.asarray(Q.quat_to_matrix(jnp.asarray(q)))
    assert abs(np.linalg.det(R) - 1.0) < 1e-4


def test_scale_recovery():
    """s_k = sqrt(S[9]/S[10]) recovers a known uniform scale."""
    rng = np.random.default_rng(7)
    fixed = make_cloud8(rng, 256)
    scale = 1.25
    moving = fixed.copy()
    moving[:, :3] = fixed[:, :3] / scale
    mf, mm = fixed[:, :3].mean(0), moving[:, :3].mean(0)
    S11 = golden_s_matrix(moving[:, :3] - mm, fixed[:, :3] - mf, 1e-3)
    _, _, sk = horn.solve_step_transform(
        jnp.asarray(S11, dtype=jnp.float32), jnp.asarray(mf), jnp.asarray(mm),
        use_power=True,
    )
    assert abs(float(sk) - scale) < 1e-3


def test_degenerate_frame_returns_identity():
    """Fully-masked frame (sensor dropout): S11 = 0 must yield identity
    rotation and unit scale, never NaN — a NaN here permanently poisons the
    accumulated ICP state (advisor finding, round 1)."""
    S11 = jnp.zeros((11,), jnp.float32)
    zeros3 = jnp.zeros((3,), jnp.float32)
    for mode in ("power", "svd", "jacobi"):
        for est in (True, False):
            qk, tk, sk = horn.solve_step_transform(
                S11, zeros3, zeros3, mode=mode, estimate_scale=est)
            assert np.isfinite(np.asarray(qk)).all(), mode
            np.testing.assert_allclose(np.asarray(qk), [0, 0, 0, 1],
                                       atol=1e-5)
            assert float(sk) == 1.0
            np.testing.assert_allclose(np.asarray(tk), 0.0, atol=1e-6)
