"""RBC construct/search tests: structural invariants + semantics vs the
per-query numpy golden (nearest rep, then exhaustive in-bin search)."""

import numpy as np
import jax.numpy as jnp

from icp_tpu.ops.distance import pairwise_sq_dists
from icp_tpu.rbc.construct import rbc_construct
from icp_tpu.rbc.grouping import group_by_bin
from icp_tpu.rbc.search import rbc_search
from tests import goldens
from tests.utils import make_cloud8

ALPHA = 150.0


def _build(rng, n=512, n_r=16, capacity=256):
    db = make_cloud8(rng, n)
    reps = db[rng.choice(n, n_r, replace=False)]
    idx = rbc_construct(jnp.asarray(db), jnp.asarray(reps),
                        jnp.float32(ALPHA), capacity)
    return db, reps, idx


def test_grouping_invariants(rng):
    ids = rng.integers(0, 16, 1000).astype(np.int32)
    g = group_by_bin(jnp.asarray(ids), 16, 256)
    counts = np.asarray(g.counts)
    assert counts.sum() == 1000
    np.testing.assert_array_equal(counts, np.bincount(ids, minlength=16))
    # offsets = exclusive scan of counts
    np.testing.assert_array_equal(np.asarray(g.offsets),
                                  np.cumsum(counts) - counts)
    # every valid member slot holds a point of that bin
    member, valid = np.asarray(g.member), np.asarray(g.valid)
    for b in range(16):
        assert valid[b].sum() == counts[b]
        assert (ids[member[b][valid[b]]] == b).all()
    # no overflow at ample capacity
    from icp_tpu.rbc.grouping import overflow_mask
    assert not np.asarray(overflow_mask(g, jnp.asarray(ids), 256)).any()


def test_counts_paths_agree(rng, monkeypatch):
    """group_by_bin's dense and sparse counts paths must both match
    bincount; bin_sort_layout (always searchsorted) must agree too."""
    from icp_tpu.rbc import grouping

    ids = rng.integers(0, 16, 1000).astype(np.int32)
    ids[ids == 7] = 3  # an empty bin exercises the zero-count edge
    expect = np.bincount(ids, minlength=16)
    for threshold in (1 << 24, 0):  # dense path, then force the sparse path
        monkeypatch.setattr(grouping, "_DENSE_COUNTS_MAX_OPS", threshold)
        g = grouping.group_by_bin(jnp.asarray(ids), 16, 256)
        np.testing.assert_array_equal(np.asarray(g.counts), expect)
    _, counts, offsets, _ = grouping.bin_sort_layout(jnp.asarray(ids), 16, 256)
    np.testing.assert_array_equal(np.asarray(counts), expect)
    np.testing.assert_array_equal(np.asarray(offsets),
                                  np.cumsum(expect) - expect)


def test_counts_sparse_at_production_shape(rng):
    """Above-threshold shape (1024 bins x 65536) takes the searchsorted
    path for real — pin it to bincount."""
    from icp_tpu.rbc.grouping import bin_sort_layout

    ids = rng.integers(0, 1024, 65536).astype(np.int32)
    sidx, counts, offsets, _ = bin_sort_layout(jnp.asarray(ids), 1024, 128)
    expect = np.bincount(ids, minlength=1024)
    np.testing.assert_array_equal(np.asarray(counts), expect)
    np.testing.assert_array_equal(np.asarray(offsets),
                                  np.cumsum(expect) - expect)
    assert (ids[np.asarray(sidx)] == np.sort(ids)).all()


def test_grouping_overflow_detection(rng):
    from icp_tpu.rbc.grouping import overflow_mask
    ids = np.zeros(100, np.int32)  # all in bin 0
    g = group_by_bin(jnp.asarray(ids), 4, 64)
    assert np.asarray(overflow_mask(g, jnp.asarray(ids), 64)).sum() == 100 - 64
    assert np.asarray(g.valid)[0].sum() == 64


def test_construct_assignment_is_nearest_rep(rng):
    db, reps, idx = _build(rng)
    d2 = np.asarray(pairwise_sq_dists(jnp.asarray(db), jnp.asarray(reps),
                                      jnp.float32(ALPHA)))
    np.testing.assert_array_equal(np.asarray(idx.rep_id), d2.argmin(1))
    # reps drawn from the db must self-match at distance ~0
    rep_pts = db[np.asarray(idx.rep_db_ids)]
    np.testing.assert_allclose(rep_pts, reps, atol=1e-5)


def test_search_matches_golden_rbc_semantics(rng):
    db, reps, idx = _build(rng, n=256, n_r=8)
    queries = make_cloud8(rng, 64)
    res = rbc_search(idx, jnp.asarray(queries), jnp.float32(ALPHA), 256)
    ref_id, ref_d2 = goldens.golden_rbc_nn(queries, db, reps, ALPHA)
    assert not np.asarray(res.fallback).any()
    np.testing.assert_array_equal(np.asarray(res.nn_id), ref_id)
    np.testing.assert_allclose(np.asarray(res.nn_dist), ref_d2, rtol=1e-4,
                               atol=0.5)


def test_search_self_query_finds_self(rng):
    """Querying the database points themselves must return identity matches
    at ~zero distance (every point's own bin contains it)."""
    db, reps, idx = _build(rng, n=512, n_r=16)
    res = rbc_search(idx, jnp.asarray(db), jnp.float32(ALPHA), 512)
    np.testing.assert_array_equal(np.asarray(res.nn_id), np.arange(512))
    assert float(jnp.max(res.nn_dist)) < 1.0  # mm^2-scale rounding floor


def test_search_query_overflow_fallback(rng):
    """With query capacity 1, overflowing queries fall back to the nearest
    representative's own database point."""
    db, reps, idx = _build(rng, n=256, n_r=8)
    queries = make_cloud8(rng, 64)
    res = rbc_search(idx, jnp.asarray(queries), jnp.float32(ALPHA), 1)
    fb = np.asarray(res.fallback)
    assert fb.any()  # 64 queries into 8 bins of capacity 1 must overflow
    rep_ids = np.asarray(res.query_rep)
    nn = np.asarray(res.nn_id)
    rep_db = np.asarray(idx.rep_db_ids)
    np.testing.assert_array_equal(nn[fb], rep_db[rep_ids[fb]])


def test_search_recall_vs_brute(rng):
    """RBC search is approximate (single-bin), but on smooth data recall of
    the exact NN should be high; perturbed self-queries must keep ~100%."""
    db, reps, idx = _build(rng, n=2048, n_r=64)
    queries = db.copy()
    queries[:, :3] += rng.normal(0, 1.0, (2048, 3))  # 1 mm jitter
    res = rbc_search(idx, jnp.asarray(queries.astype(np.float32)),
                     jnp.float32(ALPHA), 256)
    d2 = np.asarray(pairwise_sq_dists(jnp.asarray(queries.astype(np.float32)),
                                      jnp.asarray(db), jnp.float32(ALPHA)))
    exact = d2.argmin(1)
    recall = (np.asarray(res.nn_id) == exact).mean()
    assert recall > 0.95, recall
