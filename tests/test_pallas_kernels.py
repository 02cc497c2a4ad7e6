"""Pallas kernel parity tests (interpreter mode on CPU).

Mirrors the reference's per-kernel golden discipline: the fused kernel must
agree exactly in semantics with the XLA reference path.
"""

import jax
import numpy as np
import jax.numpy as jnp

from icp_tpu.ops.distance import metric_weights
from icp_tpu.kernels.bin_search import bin_search_pallas
from icp_tpu.rbc.construct import rbc_construct
from icp_tpu.rbc.search import rbc_search_grouped
from tests.utils import make_cloud8

ALPHA = 150.0


def _grouped_inputs(rng, n=512, n_r=16, cb=64, cq=64):
    db = make_cloud8(rng, n)
    reps = db[rng.choice(n, n_r, replace=False)]
    idx = rbc_construct(jnp.asarray(db), jnp.asarray(reps),
                        jnp.float32(ALPHA), cb)
    queries = make_cloud8(rng, n)
    return idx, jnp.asarray(queries)


def test_bin_search_kernel_matches_xla(rng):
    idx, queries = _grouped_inputs(rng)
    ref = rbc_search_grouped(idx, queries, jnp.float32(ALPHA), 64,
                             use_pallas=False)
    got = rbc_search_grouped(idx, queries, jnp.float32(ALPHA), 64,
                             use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.valid), np.asarray(ref.valid))
    v = np.asarray(ref.valid)
    np.testing.assert_allclose(np.asarray(got.dist_g)[v],
                               np.asarray(ref.dist_g)[v], rtol=1e-5, atol=1e-2)
    np.testing.assert_allclose(np.asarray(got.matched_g)[v],
                               np.asarray(ref.matched_g)[v], atol=1e-5)
    assert int(got.n_dropped) == int(ref.n_dropped)


def test_bin_search_kernel_direct(rng):
    """Direct kernel-level check against a numpy loop."""
    n_r, cq, cb = 4, 16, 32
    qg = rng.normal(size=(n_r, cq, 8)).astype(np.float32) * 50
    bins = rng.normal(size=(n_r, cb, 8)).astype(np.float32) * 50
    w8 = np.asarray(metric_weights(jnp.float32(ALPHA)))
    qg_w = qg * w8
    sq_b = np.sum(bins * w8 * bins, -1)
    mask = rng.uniform(size=(n_r, cb)) < 0.8
    sq_b_m = np.where(mask, sq_b, np.inf).astype(np.float32)

    score, matched = bin_search_pallas(
        jnp.asarray(qg_w), jnp.asarray(bins), jnp.asarray(sq_b_m),
        jnp.asarray(bins), bin_batch=2, interpret=True)

    for r in range(n_r):
        for qi in range(cq):
            s = sq_b_m[r] - 2.0 * (qg_w[r, qi] @ bins[r].T)
            j = int(np.argmin(s))
            assert abs(float(score[r, qi]) - s[j]) < 1e-2 * max(1, abs(s[j]))
            np.testing.assert_allclose(np.asarray(matched[r, qi]), bins[r, j],
                                       atol=1e-4)



def test_bin_table_kernel_bit_exact(rng):
    """The padded bin-table Pallas kernel is a permutation copy — its
    output must be BIT-IDENTICAL to the XLA row gather, including the
    garbage slots past each bin's count (same padded-read contract)."""
    from icp_tpu.kernels.table_build import bin_table_pallas, bin_table_ref
    from icp_tpu.rbc.grouping import bin_sort_layout

    n, n_bins, cap = 1024, 16, 96
    ids = jnp.asarray(rng.integers(0, n_bins, n).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(n, 11)).astype(np.float32))
    sidx, counts, offsets, valid = bin_sort_layout(ids, n_bins, cap)
    sorted_rows = jnp.take(rows, sidx, axis=0)
    ref = bin_table_ref(sorted_rows, offsets, capacity=cap)
    got = bin_table_pallas(sorted_rows, offsets, capacity=cap,
                           interpret=True)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_bin_table_windowed_kernel(rng):
    """The windowed table kernel (large-m path) must reproduce the XLA
    gather on every VALID slot, across all three in-kernel branches
    (window A / window B / boundary-crossing scratch concat), and the
    span check must route pathologically skewed layouts to the twin."""
    from icp_tpu.kernels.table_build import (bin_table_ref,
                                            bin_table_windowed_pallas,
                                            windowed_span_ok)
    from icp_tpu.rbc.grouping import bin_sort_layout

    n, n_bins, cap = 4096, 64, 96
    ids = jnp.asarray(rng.integers(0, n_bins, n).astype(np.int32))
    rows = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    sidx, counts, offsets, valid = bin_sort_layout(ids, n_bins, cap)
    sorted_rows = jnp.take(rows, sidx, axis=0)
    ref = np.asarray(bin_table_ref(sorted_rows, offsets, capacity=cap))
    # Smaller bin_batch shrinks the auto window, exercising more A/B
    # transitions and boundary crossings.
    for bb in (8, 4):
        assert bool(windowed_span_ok(offsets, counts, cap,
                                     bin_batch=bb, m=n)), bb
        got = np.asarray(bin_table_windowed_pallas(
            sorted_rows, offsets, capacity=cap, bin_batch=bb,
            interpret=True))
        v = np.asarray(valid)
        np.testing.assert_array_equal(got[v], ref[v])

    # Skew guard: every point in one bin -> one chunk's span is ~n, far
    # over any 2W coverage -> the span check must be False.
    ids1 = jnp.zeros((n,), jnp.int32)
    _, c1, o1, _ = bin_sort_layout(ids1, n_bins, cap)
    assert not bool(windowed_span_ok(o1, c1, cap, m=n))


def test_group_rows_by_bin_windowed_cond(rng):
    """group_rows_by_bin's large-m windowed route (pallas + span cond)
    must agree with the XLA path on valid slots — including when the skew
    guard trips and the cond takes the twin."""
    import jax

    from icp_tpu.rbc.grouping import group_rows_by_bin
    from icp_tpu.kernels import table_build

    n, n_bins, cap = 4096, 64, 96
    a = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    # Force the windowed path regardless of m by shrinking the full-VMEM
    # budget for the duration of the test.
    old = table_build._TABLE_VMEM_BUDGET
    table_build._TABLE_VMEM_BUDGET = 0
    try:
        for ids_np in (rng.integers(0, n_bins, n),
                       np.zeros(n)):  # uniform, then fully skewed
            ids = jnp.asarray(ids_np.astype(np.int32))
            ref = group_rows_by_bin(ids, n_bins, cap, (a,), use_pallas=False)
            got = group_rows_by_bin(ids, n_bins, cap, (a,), use_pallas=True,
                                    interpret=True)
            v = np.asarray(ref.valid)
            np.testing.assert_array_equal(np.asarray(got.grouped[0])[v],
                                          np.asarray(ref.grouped[0])[v])
            np.testing.assert_array_equal(np.asarray(got.counts),
                                          np.asarray(ref.counts))
    finally:
        table_build._TABLE_VMEM_BUDGET = old


def test_group_rows_by_bin_payload_sort(rng):
    """The large-m payload-sort path (one variadic sort, no permute
    gather) is bit-identical to the key-sort + take path."""
    from icp_tpu.rbc import grouping

    n, n_bins, cap = 4096, 64, 96
    ids = jnp.asarray(rng.integers(0, n_bins, n).astype(np.int32))
    a = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ref = grouping.group_rows_by_bin(ids, n_bins, cap, (a, b))
    old = grouping._PAYLOAD_SORT_MIN_ROWS
    grouping._PAYLOAD_SORT_MIN_ROWS = 0
    try:
        got = grouping.group_rows_by_bin(ids, n_bins, cap, (a, b))
    finally:
        grouping._PAYLOAD_SORT_MIN_ROWS = old
    np.testing.assert_array_equal(np.asarray(got.counts),
                                  np.asarray(ref.counts))
    np.testing.assert_array_equal(np.asarray(got.offsets),
                                  np.asarray(ref.offsets))
    for g, r in zip(got.grouped, ref.grouped):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_group_rows_by_bin_pallas_path(rng):
    """group_rows_by_bin(use_pallas=True) must agree bit-for-bit with the
    XLA path on every grouped array and the layout metadata."""
    from icp_tpu.rbc.grouping import group_rows_by_bin

    n, n_bins, cap = 2048, 32, 96
    ids = jnp.asarray(rng.integers(0, n_bins, n).astype(np.int32))
    a = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    ref = group_rows_by_bin(ids, n_bins, cap, (a, b))
    got = group_rows_by_bin(ids, n_bins, cap, (a, b),
                            use_pallas=True, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.counts),
                                  np.asarray(ref.counts))
    np.testing.assert_array_equal(np.asarray(got.valid),
                                  np.asarray(ref.valid))
    for g, r in zip(got.grouped, ref.grouped):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))


def test_rep_assign_counts_kernel(rng):
    """The counts output must equal bincount(rid) exactly, and rid must
    match the plain assignment kernel bit-for-bit (same first-min select)."""
    from icp_tpu.icp.quaternion import qidentity
    from icp_tpu.kernels.fused_step import (prep_rep_assign,
                                            prep_similarity,
                                            rep_assign_counts_pallas,
                                            rep_assign_counts_ref,
                                            rep_assign_pallas)

    n, n_r = 1024, 16
    moving = jnp.asarray(make_cloud8(rng, n))
    reps = moving[:: n // n_r][:n_r]
    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(reps, jnp.float32(ALPHA), G, b_row)

    rid_k, counts_k = rep_assign_counts_pallas(moving, C, srow,
                                               block_m=256, interpret=True)
    rid_r, counts_r = rep_assign_counts_ref(moving, C, srow)
    rid_plain = rep_assign_pallas(moving, C, srow, block_m=256,
                                  interpret=True)
    np.testing.assert_array_equal(np.asarray(rid_k), np.asarray(rid_plain))
    np.testing.assert_array_equal(
        np.asarray(counts_k),
        np.bincount(np.asarray(rid_k), minlength=n_r))
    np.testing.assert_array_equal(np.asarray(rid_k), np.asarray(rid_r))
    np.testing.assert_array_equal(np.asarray(counts_k),
                                  np.asarray(counts_r))


def test_rep_assign_counts_kernel_vmap(rng):
    """register_batch vmaps the whole iteration; the counts kernel's
    sequential-grid accumulation must stay per-lane under batching."""
    from icp_tpu.icp.quaternion import qidentity
    from icp_tpu.kernels.fused_step import (prep_rep_assign,
                                            prep_similarity,
                                            rep_assign_counts_pallas)

    n, n_r, B = 512, 16, 3
    movings = jnp.stack([jnp.asarray(make_cloud8(rng, n))
                         for _ in range(B)])
    reps = movings[0][:: n // n_r][:n_r]
    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(reps, jnp.float32(ALPHA), G, b_row)

    rid_b, counts_b = jax.vmap(
        lambda mv: rep_assign_counts_pallas(mv, C, srow, block_m=128,
                                            interpret=True))(movings)
    for i in range(B):
        rid_i, counts_i = rep_assign_counts_pallas(
            movings[i], C, srow, block_m=128, interpret=True)
        np.testing.assert_array_equal(np.asarray(rid_b[i]),
                                      np.asarray(rid_i))
        np.testing.assert_array_equal(np.asarray(counts_b[i]),
                                      np.asarray(counts_i))
