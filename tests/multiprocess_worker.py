"""Worker for the true multi-process distributed test.

Launched (2x) by tests/test_multiprocess.py: initializes jax.distributed on
the CPU backend (Gloo collectives — the DCN stand-in), builds a global
(dp=2, mp=1) mesh spanning both processes, forms global sharded arrays from
process-local data, runs the sharded registration, and prints the resulting
transform for the parent to compare.
"""

import os
import sys


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])

    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    from icp_tpu.parallel.distributed import initialize_multihost

    initialize_multihost(coordinator_address=f"localhost:{port}",
                         num_processes=2, process_id=pid)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from icp_tpu import Correspondence, ICPConfig, ICPParams, RotationMode, Weighting
    from icp_tpu.parallel.distributed import make_global_mesh
    from icp_tpu.parallel.sharded import make_sharded_register

    mesh = make_global_mesh(n_dp=2, n_mp=1)
    assert len(jax.devices()) == 2, jax.devices()

    # Deterministic pair, identical in both processes.
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from __graft_entry__ import _synthetic_pair

    m = 4096
    fixed_np, moving_np = _synthetic_pair(m, seed=7)

    config = ICPConfig(m=m, n_r=64, rotation=RotationMode.POWER,
                       weighting=Weighting.WEIGHTED,
                       correspondence=Correspondence.RBC,
                       estimate_scale=False, max_iterations=20)
    params = ICPParams(alpha=2e2, angle_threshold_deg=0.0,
                       translation_threshold=0.0).as_f32()

    # fixed: replicated; moving: dp-sharded (this process owns its half).
    fixed = jax.make_array_from_callback(
        fixed_np.shape, NamedSharding(mesh, P()),
        lambda idx: fixed_np[idx])
    moving = jax.make_array_from_callback(
        moving_np.shape, NamedSharding(mesh, P("dp", None)),
        lambda idx: moving_np[idx])

    run = make_sharded_register(mesh, config)
    state = jax.block_until_ready(run(fixed, moving, params))

    T = np.asarray(jax.device_get(state.T))
    k = int(state.k)
    print(f"RESULT {pid} k={k} T=" + ",".join(f"{v:.6f}" for v in T),
          flush=True)


if __name__ == "__main__":
    main()
