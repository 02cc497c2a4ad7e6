"""Fused search+moments kernel parity vs the unfused grouped path."""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu.ops import moments
from icp_tpu.rbc.construct import rbc_construct
from icp_tpu.rbc.search import rbc_search_grouped, rbc_search_moments
from tests.utils import make_cloud8

ALPHA = 150.0
C = 1e-6


def _setup(rng, n=512, n_r=16, cap=64):
    db = make_cloud8(rng, n)
    reps = db[rng.choice(n, n_r, replace=False)]
    idx = rbc_construct(jnp.asarray(db), jnp.asarray(reps),
                        jnp.float32(ALPHA), cap)
    queries = make_cloud8(rng, n)
    return idx, jnp.asarray(queries)


def _unfused(idx, queries, cq, weighted):
    res = rbc_search_grouped(idx, queries, jnp.float32(ALPHA), cq)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    mv, mf = flat(res.queries_g), flat(res.matched_g)
    nd, mask = flat(res.dist_g), flat(res.valid)
    pv = jnp.logical_and(jnp.sum(jnp.abs(mv[..., :3]), -1) > 0,
                         jnp.sum(jnp.abs(mf[..., :3]), -1) > 0)
    mask = jnp.logical_and(mask, pv)
    if weighted:
        w = jnp.where(mask, moments.compute_weights(nd), 0.0)
        sw = moments.masked_weight_sum(w)
    else:
        w, sw = None, None
    mean_f, mean_m = moments.centroids(mf, mv, w, sw, mask)
    S11 = moments.s_matrix(moments.deviations(mv, mean_m),
                           moments.deviations(mf, mean_f),
                           jnp.float32(C), w, mask)
    return S11, mean_f, mean_m


@pytest.mark.parametrize("weighted", [True, False])
def test_fused_matches_unfused(rng, weighted):
    idx, queries = _setup(rng)
    cq = 64
    S_ref, mf_ref, mm_ref = _unfused(idx, queries, cq, weighted)
    S, mf, mm, W, nv = rbc_search_moments(
        idx, queries, jnp.float32(ALPHA), cq, weighted=weighted,
        c=jnp.float32(C), interpret=True)

    np.testing.assert_allclose(np.asarray(mf), np.asarray(mf_ref), atol=0.05)
    np.testing.assert_allclose(np.asarray(mm), np.asarray(mm_ref), atol=0.05)
    ref = np.asarray(S_ref)
    np.testing.assert_allclose(np.asarray(S), ref,
                               atol=2e-4 * np.abs(ref).max(), rtol=2e-3)
    # Some queries overflow their bin's capacity (dropped identically in
    # both paths — the S/means comparisons above prove it).
    assert 0.9 * queries.shape[0] <= int(nv) <= queries.shape[0]


def test_fused_transform_recovery(rng):
    """End-to-end sanity: one fused-step solve from perfectly-corresponded
    pairs recovers the known transform (interpret mode)."""
    from icp_tpu.icp.horn import solve_step_transform
    from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul, qrotate
    from tests.utils import random_quat

    db = make_cloud8(rng, 512)
    q_true = random_quat(rng, 0.02)
    t_true = (rng.normal(size=3) * 5).astype(np.float32)
    queries = db.copy()
    qi = qconj(jnp.asarray(q_true))
    queries[:, :3] = np.asarray(
        qrotate(qi, jnp.asarray(db[:, :3] - t_true)))

    reps = db[rng.choice(512, 16, replace=False)]
    idx = rbc_construct(jnp.asarray(db), jnp.asarray(reps),
                        jnp.float32(ALPHA), 64)
    S, mf, mm, W, nv = rbc_search_moments(
        idx, jnp.asarray(queries), jnp.float32(ALPHA), 64, weighted=True,
        c=jnp.float32(C), interpret=True)
    qk, tk, sk = solve_step_transform(S, mf, mm, mode="power",
                                      estimate_scale=False)
    # One NN-based iteration from a small offset: the solve should move
    # strongly toward the truth (matches are mostly correct at this scale).
    err0 = np.linalg.norm(t_true)
    err1 = np.linalg.norm(np.asarray(tk) - t_true)
    assert err1 < err0 * 0.5, (err0, err1)
