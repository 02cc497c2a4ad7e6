"""Quaternion / transform unit tests (vs numpy goldens and algebra laws)."""

import numpy as np
import jax.numpy as jnp

from icp_tpu.icp import quaternion as Q
from tests.goldens import golden_transform_q
from tests.utils import make_cloud8, random_quat


def test_qmul_composition_matches_matrix_product(rng):
    q1 = random_quat(rng, 2.0)
    q2 = random_quat(rng, 2.0)
    R1 = np.asarray(Q.quat_to_matrix(jnp.asarray(q1)))
    R2 = np.asarray(Q.quat_to_matrix(jnp.asarray(q2)))
    R12 = np.asarray(Q.quat_to_matrix(Q.qmul(jnp.asarray(q1), jnp.asarray(q2))))
    np.testing.assert_allclose(R12, R1 @ R2, atol=1e-6)


def test_qrotate_matches_matrix(rng):
    q = random_quat(rng, 3.0)
    p = rng.normal(size=(32, 3)).astype(np.float32)
    R = np.asarray(Q.quat_to_matrix(jnp.asarray(q)))
    got = np.asarray(Q.qrotate(jnp.asarray(q), jnp.asarray(p)))
    np.testing.assert_allclose(got, p @ R.T, atol=1e-5)


def test_matrix_quat_roundtrip(rng):
    for _ in range(20):
        q = random_quat(rng, 3.1)
        R = Q.quat_to_matrix(jnp.asarray(q))
        q2 = np.asarray(Q.matrix_to_quat(R))
        # q and -q are the same rotation; matrix_to_quat canonicalizes w>=0.
        if q[3] < 0:
            q = -q
        np.testing.assert_allclose(q2, q, atol=1e-5)


def test_transform_points_matches_reference_kernel_semantics(rng):
    pts = make_cloud8(rng, 64)
    q = random_quat(rng, 0.5)
    t = rng.normal(size=3).astype(np.float32) * 10
    s = np.float32(1.02)
    ref = golden_transform_q(pts, q, t, s)
    got = np.asarray(Q.transform_points(jnp.asarray(pts), jnp.asarray(q),
                                        jnp.asarray(t), jnp.asarray(s)))
    # Photometric half untouched:
    np.testing.assert_array_equal(got[:, 4:], pts[:, 4:])
    np.testing.assert_array_equal(got[:, 3], pts[:, 3])
    np.testing.assert_allclose(got[:, :3], ref[:, :3], rtol=1e-5, atol=1e-3)


def test_transform_matrix_matches_quaternion_path(rng):
    pts = make_cloud8(rng, 64)
    q = random_quat(rng, 0.5)
    t = rng.normal(size=3).astype(np.float32) * 10
    s = np.float32(0.98)
    T = Q.similarity_to_matrix(jnp.asarray(q), jnp.asarray(t), jnp.asarray(s))
    got_m = np.asarray(Q.transform_points_matrix(jnp.asarray(pts), T))
    got_q = np.asarray(Q.transform_points(jnp.asarray(pts), jnp.asarray(q),
                                          jnp.asarray(t), jnp.asarray(s)))
    np.testing.assert_allclose(got_m[:, :3], got_q[:, :3], rtol=1e-5, atol=1e-2)


def test_pack_unpack_T(rng):
    q = random_quat(rng, 1.0)
    t = rng.normal(size=3).astype(np.float32)
    s = np.float32(1.1)
    T8 = Q.pack_T(jnp.asarray(q), jnp.asarray(t), jnp.asarray(s))
    assert T8.shape == (8,)
    q2, t2, s2 = Q.unpack_T(T8)
    np.testing.assert_array_equal(np.asarray(q2), q)
    np.testing.assert_array_equal(np.asarray(t2), t)
    assert float(s2) == float(s)


def test_qangle_deg():
    # 90 deg about z: q = [0, 0, sin45, cos45]
    q = jnp.array([0.0, 0.0, np.sin(np.pi / 4), np.cos(np.pi / 4)])
    assert abs(float(Q.qangle_deg(q)) - 90.0) < 1e-4
    assert abs(float(Q.qangle_deg(Q.qidentity()))) < 1e-6
