"""Brute-force Pallas NN kernel parity (interpreter mode)."""

import numpy as np
import jax.numpy as jnp

from icp_tpu.kernels.brute_nn import nearest_neighbor_brute_pallas
from icp_tpu.ops.distance import nearest_neighbor_brute
from tests.utils import make_cloud8

ALPHA = 180.0


def test_brute_pallas_matches_xla(rng):
    q = make_cloud8(rng, 256)
    db = make_cloud8(rng, 512)
    ref_idx, ref_d = nearest_neighbor_brute(jnp.asarray(q), jnp.asarray(db),
                                            jnp.float32(ALPHA))
    got_idx, got_d = nearest_neighbor_brute_pallas(
        jnp.asarray(q), jnp.asarray(db), jnp.float32(ALPHA), interpret=True)
    np.testing.assert_array_equal(np.asarray(got_idx), np.asarray(ref_idx))
    np.testing.assert_allclose(np.asarray(got_d), np.asarray(ref_d),
                               rtol=1e-4, atol=1.0)


def test_brute_pallas_multi_tile(rng):
    """Tiling across both grid axes with the running-best carry."""
    from icp_tpu.kernels.brute_nn import brute_nn_pallas
    from icp_tpu.ops.distance import metric_weights

    q = make_cloud8(rng, 128)
    db = make_cloud8(rng, 256)
    w8 = np.asarray(metric_weights(jnp.float32(ALPHA)))
    qw = q * w8
    sq_db = (db * w8 * db).sum(-1).astype(np.float32)

    idx, score = brute_nn_pallas(jnp.asarray(qw), jnp.asarray(db),
                                 jnp.asarray(sq_db), tq=32, td=64,
                                 interpret=True)
    ref = sq_db[None, :] - 2.0 * (qw @ db.T)
    np.testing.assert_array_equal(np.asarray(idx), ref.argmin(1))
    np.testing.assert_allclose(np.asarray(score), ref.min(1), rtol=1e-4,
                               atol=1.0)
