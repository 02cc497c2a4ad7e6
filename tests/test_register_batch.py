"""Batched multi-pair registration (beyond-reference serving mode).

``register_batch`` vmaps the full registration; the batched while_loop's
select must freeze converged lanes so every lane reproduces its single-pair
result exactly (including the iteration count).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from icp_tpu import (
    Correspondence,
    ICPConfig,
    ICPParams,
    Objective,
    register,
    register_batch,
)
from icp_tpu.icp.quaternion import qangle_deg, qconj, qmul
from tests.test_icp_e2e import _make_pair

PARAMS = ICPParams(alpha=2e2).as_f32()


def _batch(rng, b, n):
    pairs = [_make_pair(rng, n, angle=0.01 * (i + 1), trans=5.0 * (i + 1))
             for i in range(b)]
    fixed = jnp.stack([jnp.asarray(p[0]) for p in pairs])
    moving = jnp.stack([jnp.asarray(p[1]) for p in pairs])
    return fixed, moving, [p[2] for p in pairs], [p[3] for p in pairs]


@pytest.mark.parametrize("config", [
    ICPConfig(m=1024, n_r=16, estimate_scale=False),
    ICPConfig(m=1024, n_r=16, correspondence=Correspondence.BRUTE,
              estimate_scale=False),
    ICPConfig(m=1024, n_r=16, objective=Objective.PLANE,
              estimate_scale=False),
])
def test_register_batch_matches_single(rng, config):
    fixed, moving, qs, ts = _batch(rng, 3, 1024)
    batch = register_batch(fixed, moving, PARAMS, config)
    for i in range(3):
        single = register(fixed[i], moving[i], PARAMS, config)
        assert int(batch.k[i]) == int(single.k), i
        np.testing.assert_allclose(np.asarray(batch.q[i]),
                                   np.asarray(single.q), atol=1e-6)
        np.testing.assert_allclose(np.asarray(batch.t[i]),
                                   np.asarray(single.t), atol=1e-3)
        # And each lane recovers its own ground truth.
        a_err = float(qangle_deg(qmul(batch.q[i], qconj(jnp.asarray(qs[i])))))
        assert a_err < 0.1, (i, a_err)
        np.testing.assert_allclose(np.asarray(batch.t[i]), ts[i], atol=1.0)
