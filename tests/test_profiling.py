"""Profiling-mode op timings (reference --profiling parity).

Run ``pytest tests/test_profiling.py --profiling -s`` to print a per-op
numpy-vs-XLA latency comparison like the reference's CPU-vs-GPU tables
(tests/testsICP.cpp:108-131). Without the flag the test only asserts the
ops run.
"""

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.ops import moments, sampling
from icp_tpu.ops.distance import pairwise_sq_dists
from icp_tpu.runtime.timing import CPUTimer, ProfilingInfo, device_time
from tests import goldens
from tests.utils import make_cloud8


def test_op_profile(rng, profiling):
    F = make_cloud8(rng, 16384)
    M = make_cloud8(rng, 16384)
    cloud = make_cloud8(rng, 640 * 480).reshape(480, 640, 8)
    W = rng.uniform(0.1, 1.0, 16384).astype(np.float32)

    info = ProfilingInfo("op profile (ms)")

    cases = {
        "get_landmarks": (
            lambda: goldens.golden_get_landmarks(cloud),
            jax.jit(sampling.get_landmarks), (jnp.asarray(cloud),),
        ),
        "centroids": (
            lambda: goldens.golden_means(F, M),
            jax.jit(moments.centroids), (jnp.asarray(F), jnp.asarray(M)),
        ),
        "s_matrix": (
            lambda: goldens.golden_s_matrix(M[:, :3], F[:, :3], 1e-6, W),
            jax.jit(moments.s_matrix),
            (jnp.asarray(M[:, :3]), jnp.asarray(F[:, :3]),
             jnp.float32(1e-6), jnp.asarray(W)),
        ),
        "dists_16384x256": (
            None,
            jax.jit(pairwise_sq_dists),
            (jnp.asarray(M), jnp.asarray(F[:256]), jnp.float32(2e2)),
        ),
    }

    for name, (cpu_fn, dev_fn, args) in cases.items():
        ms = device_time(dev_fn, *args, reps=3)
        info.record(f"{name} [xla]", ms)
        if profiling and cpu_fn is not None:
            with CPUTimer() as t:
                cpu_fn()
            info.record(f"{name} [numpy]", t.span_ms)

    if profiling:
        info.print()
    assert info.total("centroids [xla]") >= 0
