"""TRUE multi-process distributed registration (2 processes, 1 CPU device
each, Gloo collectives standing in for DCN) — validates
parallel.distributed + parallel.sharded across a real process boundary,
the capability the reference lacks entirely."""

import os
import socket
import subprocess
import sys

import numpy as np
import jax.numpy as jnp
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_registration_matches_single():
    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "multiprocess_worker.py")
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
                   + os.environ.get("PYTHONPATH", "").split(os.pathsep)))
    # Workers must not inherit the forced single-CPU-device test flags in a
    # conflicting way; they set their own platform.
    env.pop("XLA_FLAGS", None)

    procs = [subprocess.Popen(
        [sys.executable, worker, str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
        assert p.returncode == 0, out[-2000:]

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                parts = line.split()
                pid = int(parts[1])
                k = int(parts[2].split("=")[1])
                T = np.asarray([float(x) for x in
                                parts[3].split("=")[1].split(",")])
                results[pid] = (k, T)
    assert set(results) == {0, 1}, outs

    # Both processes computed the identical replicated result.
    np.testing.assert_allclose(results[0][1], results[1][1], atol=1e-6)
    assert results[0][0] == results[1][0] == 20

    # And it matches the single-process registration.
    from icp_tpu import (Correspondence, ICPConfig, ICPParams, RotationMode,
                         Weighting, register)
    from __graft_entry__ import _synthetic_pair

    fixed_np, moving_np = _synthetic_pair(4096, seed=7)
    config = ICPConfig(m=4096, n_r=64, rotation=RotationMode.POWER,
                       weighting=Weighting.WEIGHTED,
                       correspondence=Correspondence.RBC,
                       estimate_scale=False, max_iterations=20)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()
    single = register(jnp.asarray(fixed_np), jnp.asarray(moving_np), params,
                      config)
    T_single = np.asarray(single.T)
    np.testing.assert_allclose(results[0][1][:4], T_single[:4], atol=5e-4)
    np.testing.assert_allclose(results[0][1][4:7], T_single[4:7], atol=0.2)
