"""Pallas kernel parity tests (interpreter mode on CPU).

Mirrors the reference's per-kernel golden discipline: the fused kernel must
agree exactly in semantics with the XLA reference path.
"""

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

