"""Fused PLANE/GICP pipeline (kernels/fused_gn.py) parity tests.

Same three-layer evidence as the fused POINT tests (test_fused_moments):
  1. step-level: `icp_step(fused_gn=True)` == the grouped-search path, at
     a random accumulated state, for PLANE / symmetric PLANE / GICP;
  2. kernel-level: interpret-mode Pallas == the plain-XLA twin;
  3. algebra-level: the closed-form Cholesky row decomposition reproduces
     inv(M) exactly, and the hoisted translation tensor matches the
     direct per-bin congruence.
"""

import dataclasses

import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu.icp.state import identity_state
from icp_tpu.icp.step import icp_step
from icp_tpu.ops.normals import normals_for
from icp_tpu.rbc.construct import rbc_construct
from icp_tpu.rbc.search import rbc_gn_system
from icp_tpu.runtime.config import ICPConfig, ICPParams, Objective, Weighting
from tests.utils import make_cloud8, random_quat

ALPHA = 150.0


def _setup(rng, n=512, n_r=16, cap=64):
    db = make_cloud8(rng, n)
    reps = db[rng.choice(n, n_r, replace=False)]
    normals = np.asarray(normals_for(jnp.asarray(db), "knn"))
    idx = rbc_construct(jnp.asarray(db), jnp.asarray(reps),
                        jnp.float32(ALPHA), cap,
                        normals=jnp.asarray(normals))
    moving = make_cloud8(rng, n)
    return idx, jnp.asarray(moving)


def _random_state(rng):
    q = jnp.asarray(random_quat(rng, 0.05))
    t = jnp.asarray((rng.normal(size=3) * 10).astype(np.float32))
    return identity_state()._replace(q=q, t=t)


PARAMS = ICPParams(alpha=ALPHA).as_f32()


@pytest.mark.parametrize("objective,symmetric,weighting", [
    (Objective.PLANE, False, Weighting.WEIGHTED),
    (Objective.PLANE, True, Weighting.REGULAR),
    (Objective.GICP, False, Weighting.WEIGHTED),
])
def test_fused_gn_step_matches_unfused(rng, objective, symmetric, weighting):
    """The fused GN path produces the same iteration as the grouped-search
    + XLA GN-reduction path, at a non-identity accumulated state."""
    idx, moving = _setup(rng)
    state = _random_state(rng)
    mnormals = normals_for(moving, "knn")
    base = dict(m=moving.shape[0], n_r=idx.reps.shape[0],
                query_capacity=64, objective=objective,
                plane_symmetric=symmetric, weighting=weighting,
                normal_mode="knn", use_pallas=False, estimate_scale=False)
    s_fused = icp_step(state, moving, idx, PARAMS,
                       ICPConfig(**base, fused_gn=True),
                       moving_normals=mnormals)
    s_ref = icp_step(state, moving, idx, PARAMS,
                     ICPConfig(**base, fused_gn=False),
                     moving_normals=mnormals)
    np.testing.assert_allclose(np.asarray(s_fused.qk), np.asarray(s_ref.qk),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(s_fused.tk), np.asarray(s_ref.tk),
                               atol=0.05)


@pytest.mark.parametrize("mode", ["plane", "plane_sym", "gicp"])
def test_gn_kernel_matches_ref_twin(rng, mode):
    """Interpret-mode Pallas == plain-XLA twin (race-detection analog)."""
    idx, moving = _setup(rng)
    state = _random_state(rng)
    mn = normals_for(moving, "knn") if mode != "plane" else None
    kwargs = dict(mode=mode, weighted=True, gicp_eps=1e-3,
                  mnormals_rot=mn)
    V_k = rbc_gn_system(idx, moving, state.q, state.t, state.s,
                        jnp.float32(ALPHA), 64, use_pallas=True,
                        interpret=True, **kwargs)
    V_r = rbc_gn_system(idx, moving, state.q, state.t, state.s,
                        jnp.float32(ALPHA), 64, use_pallas=False, **kwargs)
    tol = 1e-4 * max(float(jnp.max(jnp.abs(V_r))), 1.0)
    np.testing.assert_allclose(np.asarray(V_k), np.asarray(V_r), atol=tol)


@pytest.mark.parametrize("mode", ["plane", "plane_sym", "gicp"])
def test_gn_v_layouts_agree(rng, mode):
    """Every alternative moment layout — "lane" (components on sublanes,
    rows x queries on lanes) and "rowcat" (rows concatenated along the
    query axis, one dot_general) — computes the same per-bin P as the
    original "sublane" layout, reduction order aside."""
    from icp_tpu.kernels.fused_gn import bin_gn_moments_ref
    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.rbc.search import rbc_point_assign

    idx, moving = _setup(rng)
    state = _random_state(rng)
    mn = normals_for(moving, "knn")
    rid, G, b_row = rbc_point_assign(idx, moving, state.q, state.t,
                                     state.s, jnp.float32(ALPHA),
                                     use_pallas=False)
    gl = group_rows_by_bin(rid, idx.reps.shape[0], 64, (moving, mn))
    args = (gl.grouped[0], None if mode == "plane" else gl.grouped[1],
            gl.valid.astype(moving.dtype), idx.reps, idx.bins_vals12,
            idx.sq_b_masked, G, b_row, jnp.float32(ALPHA))
    kw = dict(mode=mode, weighted=True, gicp_eps=1e-3)
    P_sub = bin_gn_moments_ref(*args, v_layout="sublane", **kw)
    tol = 1e-4 * max(float(jnp.max(jnp.abs(P_sub))), 1.0)
    for layout in ("lane", "rowcat"):
        P_alt = bin_gn_moments_ref(*args, v_layout=layout, **kw)
        np.testing.assert_allclose(np.asarray(P_alt), np.asarray(P_sub),
                                   atol=tol, err_msg=layout)


def test_gicp_cholesky_rows_reproduce_inverse(rng):
    """sum_k u_k u_k^T == inv(M) for the closed-form L^{-1} rows — the
    identity that lets GICP's 3x3 Mahalanobis weight run as three
    plane-style rank-1 rows (see kernels/fused_gn.py docstring)."""
    from icp_tpu.kernels.fused_gn import _chol3_inv_rows

    eps = 1e-3
    nf = rng.normal(size=(64, 3)).astype(np.float32)
    nf /= np.linalg.norm(nf, axis=1, keepdims=True)
    nm = rng.normal(size=(64, 3)).astype(np.float32)
    nm /= np.linalg.norm(nm, axis=1, keepdims=True)
    nm[:8] = nf[:8]        # parallel normals (the common aligned case)
    nm[8:16] = -nf[8:16]   # anti-parallel
    nf[16:24] = 0.0        # missing normals -> isotropic
    e = 1.0 - eps
    M = (2.0 * np.eye(3, dtype=np.float32)
         - e * (nf[:, :, None] * nf[:, None, :]
                + nm[:, :, None] * nm[:, None, :]))
    u1, u2, u3 = _chol3_inv_rows(
        jnp.asarray(M[:, 0, 0]), jnp.asarray(M[:, 1, 0]),
        jnp.asarray(M[:, 1, 1]), jnp.asarray(M[:, 2, 0]),
        jnp.asarray(M[:, 2, 1]), jnp.asarray(M[:, 2, 2]))
    z = np.zeros(64, np.float32)
    U = np.stack([
        np.stack([np.asarray(u1[0]), z, z], -1),
        np.stack([np.asarray(u2[0]), np.asarray(u2[1]), z], -1),
        np.stack([np.asarray(u3[0]), np.asarray(u3[1]),
                  np.asarray(u3[2])], -1),
    ], axis=1)  # (64, 3, 3) rows of L^{-1}
    got = np.einsum("nki,nkj->nij", U, U)
    want = np.linalg.inv(M)
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_gn_translation_tensor_matches_direct(rng):
    """gn_v_total via the hoisted W_t matvec == the direct per-bin
    congruence at realistic rep magnitudes."""
    from icp_tpu.kernels.fused_gn import gn_translation_tensor, gn_v_total

    reps = jnp.asarray(make_cloud8(rng, 16))
    P = jnp.asarray(rng.normal(size=(16, 8, 8)).astype(np.float32) * 20.0)
    direct = gn_v_total(P, reps)
    fast = gn_v_total(P, reps, gn_translation_tensor(reps))
    np.testing.assert_allclose(
        np.asarray(fast), np.asarray(direct), rtol=2e-5,
        atol=1e-3 * float(jnp.max(jnp.abs(direct))))


def test_fused_gn_registration_recovers_transform(rng):
    """End-to-end: a fused PLANE registration on a synthetic pair with a
    known transform lands on the truth (the e2e accuracy tests in
    test_plane/test_gicp also route through this path by default)."""
    import icp_tpu
    from icp_tpu.icp.quaternion import (
        qangle_deg, qconj, qmul, qrotate, transform_points)

    n = 2048
    db = make_cloud8(rng, n)
    q = np.array([0.004, 0.009, 0.006, 0.9999], np.float32)
    q /= np.linalg.norm(q)
    t = np.array([8.0, -5.0, 3.0], np.float32)
    qi = qconj(jnp.asarray(q))
    moving = transform_points(jnp.asarray(db), qi,
                              -qrotate(qi, jnp.asarray(t)), jnp.float32(1.0))
    cfg = ICPConfig(m=n, n_r=16, objective=Objective.PLANE,
                    normal_mode="knn", estimate_scale=False)
    assert cfg.fused_gn
    st = icp_tpu.register(jnp.asarray(db), moving, PARAMS, cfg)
    assert float(qangle_deg(qmul(st.q, qconj(jnp.asarray(q))))) < 0.01
    assert float(jnp.max(jnp.abs(st.t - jnp.asarray(t)))) < 0.05
