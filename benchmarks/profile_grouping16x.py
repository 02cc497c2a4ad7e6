"""Sub-component attribution of the grouping stage at the 16x shape
(262144x2048), where it is 53% of the iteration (benchmarks/roofline.py):
which of sort / counts / row-permute / table-build actually explodes?

    PYTHONPATH=/root/repo:$PYTHONPATH python -u benchmarks/profile_grouping16x.py [m n_r]
"""

import sys
import time
from functools import partial

import numpy as np

N_HI, N_LO = 40, 8


def main():
    import jax
    import jax.numpy as jnp

    from icp_tpu import ICPConfig, ICPParams
    from icp_tpu.icp.quaternion import qidentity
    from icp_tpu.icp.run import build_index
    from icp_tpu.kernels.fused_step import (prep_rep_assign, prep_similarity,
                                            rep_assign_counts_pallas)
    from icp_tpu.rbc.grouping import (_counts_from_sorted, bin_sort_layout,
                                      group_rows_by_bin)
    from __graft_entry__ import _synthetic_pair

    m = int(sys.argv[1]) if len(sys.argv) > 1 else 262144
    n_r = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    config = ICPConfig(m=m, n_r=n_r)
    params = ICPParams(alpha=2e2).as_f32()
    _, moving_np = _synthetic_pair(m)
    moving = jnp.asarray(moving_np)
    index = jax.block_until_ready(jax.jit(
        lambda f: build_index(f, params, config))(
            jnp.asarray(_synthetic_pair(m)[0])))
    G, b_row = prep_similarity(qidentity(), jnp.zeros(3), jnp.float32(1.0))
    C, srow = prep_rep_assign(index.reps, params.alpha, G, b_row)
    rid0, counts0 = (jax.block_until_ready(x) for x in
                     rep_assign_counts_pallas(moving, C, srow))

    def timed(label, body):
        @partial(jax.jit, static_argnames=("n",))
        def run(c, n):
            return jax.lax.fori_loop(0, n, body, c)

        def t_of(n):
            out = run(moving, n)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                out = run(moving, n)
                float(np.asarray(
                    jax.tree_util.tree_leaves(out)[0]).ravel()[0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
        print(f"{label:44s} {per*1e3:9.4f} ms", flush=True)

    n = m
    iota = jnp.arange(n, dtype=jnp.int32)

    def b_sort_key(i, mv):
        key = rid0 * jnp.int32(n) + iota
        skey = jax.lax.sort(key)
        return mv + (skey[0] % 7).astype(mv.dtype) * 1e-20

    timed("composite-key lax.sort (int32)", b_sort_key)

    def b_sort2(i, mv):
        sbin, sidx = jax.lax.sort((rid0, iota), num_keys=1, is_stable=True)
        return mv + (sidx[0] % 7).astype(mv.dtype) * 1e-20

    timed("two-array lax.sort (key+index)", b_sort2)

    def b_counts(i, mv):
        key = rid0 * jnp.int32(n) + iota
        skey = jax.lax.sort(key)
        sbin = skey // n
        cts = _counts_from_sorted(sbin, n_r)
        return mv + (cts[0] % 7).astype(mv.dtype) * 1e-20

    timed("sort + counts(searchsorted)", b_counts)

    def b_layout(i, mv):
        sidx, cts, offs, valid = bin_sort_layout(rid0, n_r,
                                                 config.query_capacity,
                                                 counts=counts0)
        return mv + (sidx[0] % 7).astype(mv.dtype) * 1e-20

    timed("bin_sort_layout (precomputed counts)", b_layout)

    sidx0, cts0, offs0, valid0 = (jax.block_until_ready(x) for x in
                                  bin_sort_layout(rid0, n_r,
                                                  config.query_capacity))

    def b_permute(i, mv):
        sorted_big = jnp.take(mv, sidx0, axis=0)
        return mv + sorted_big[0, :1] * 1e-20

    timed("row permute take (m, 8)", b_permute)

    sorted_big0 = jax.block_until_ready(jnp.take(moving, sidx0, axis=0))
    cap = config.query_capacity

    def b_table_xla(i, mv):
        padded = jnp.concatenate(
            [sorted_big0, jnp.zeros((cap, 8), mv.dtype)], axis=0)
        flat = (offs0[:, None]
                + jnp.arange(cap, dtype=jnp.int32)[None, :]).reshape(-1)
        tb = jnp.take(padded, flat, axis=0).reshape(n_r, cap, 8)
        return mv + tb[0, 0, :1] * 1e-20

    timed("table build (XLA row gather)", b_table_xla)

    from icp_tpu.kernels.table_build import (bin_table_pallas,
                                             bin_table_windowed_pallas,
                                             table_kernel_fits,
                                             windowed_span_ok)

    if jax.default_backend() == "tpu" and table_kernel_fits(n, n_r, cap, 8):
        def b_table_pl(i, mv):
            tb = bin_table_pallas(sorted_big0, offs0, capacity=cap)
            return mv + tb[0, 0, :1] * 1e-20

        timed("table build (Pallas dynamic slices)", b_table_pl)
    else:
        print(f"table kernel fits: "
              f"{table_kernel_fits(n, n_r, cap, 8)}", flush=True)

    if jax.default_backend() == "tpu":
        print("windowed span ok:",
              bool(windowed_span_ok(offs0, cts0, cap, m=n)), flush=True)

        def b_table_win(i, mv):
            tb = bin_table_windowed_pallas(sorted_big0, offs0, capacity=cap)
            return mv + jnp.sum(tb[0, 0]) * 1e-20

        timed("table build (Pallas windowed)", b_table_win)

    def b_full(i, mv):
        gl = group_rows_by_bin(rid0, n_r, cap, (mv,),
                               use_pallas=jax.default_backend() == "tpu",
                               counts=counts0)
        return mv * (1.0 + gl.grouped[0][0, 0, 0] * 1e-30)

    timed("group_rows_by_bin (full, hot-path args)", b_full)


if __name__ == "__main__":
    main()
