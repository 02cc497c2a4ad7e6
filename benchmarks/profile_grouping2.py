"""Second-generation grouping microbenchmark: production sub-ops, measured
with realistic data flow (rows + ids change every loop iteration)."""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 200, 40


def timed(label, body_builder, carry0, reps=3):
    """Marginal per-op latency, axon-proof: forced HOST READ of the result
    (block_until_ready returns at enqueue under the tunnel) and
    (T(N_HI) - T(N_LO)) / (N_HI - N_LO) differencing to cancel the ~25 ms
    dispatch floor — the same method as bench.py."""
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def run(c, n):
        return jax.lax.fori_loop(0, n, body_builder(), c)

    def t_of(n):
        out = run(carry0, n)
        first = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(first).ravel()[0])  # force host read
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(carry0, n)
            first = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(first).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_op = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
    print(f"{label:56s} {per_op*1e3:8.4f} ms/op")


def main():
    from icp_tpu.rbc.grouping import group_by_bin, gather_grouped

    m, n_bins, cap = 16384, 256, 128
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, n_bins, m, dtype=np.int32))
    rows0 = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    carry0 = (ids0, rows0)

    def touch(ids, x):
        return (ids + x.astype(jnp.int32)) % n_bins

    def v_layout_no_member():
        def body(i, c):
            ids, rows = c
            order = jnp.argsort(ids, stable=True).astype(jnp.int32)
            counts = jnp.sum(
                (ids[None, :] == jnp.arange(n_bins, dtype=ids.dtype)[:, None])
                .astype(jnp.int32), axis=1)
            offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
            return (touch(ids, order[0] + counts[0] + offsets[0]), rows)
        return body

    def v_full_layout():
        def body(i, c):
            ids, rows = c
            g = group_by_bin(ids, n_bins, cap)
            return (touch(ids, g.member[0, 0] + g.counts[0]), rows)
        return body

    def v_row_permute():
        def body(i, c):
            ids, rows = c
            order = jnp.argsort(ids, stable=True).astype(jnp.int32)
            sorted_rows = rows[order]
            return (touch(ids, sorted_rows[0, 0]), rows)
        return body

    def v_gather_grouped():
        def body(i, c):
            ids, rows = c
            g = group_by_bin(ids, n_bins, cap)
            qg = gather_grouped(g, rows)
            return (touch(ids, qg[0, 0, 0]), rows)
        return body

    def v_sorted_take():
        # permute via jnp.take with sorted indices (same as rows[order])
        def body(i, c):
            ids, rows = c
            order = jnp.argsort(ids, stable=True).astype(jnp.int32)
            sorted_rows = jnp.take(rows, order, axis=0)
            return (touch(ids, sorted_rows[0, 0]), rows)
        return body

    def v_sort_rows_directly():
        # lax.sort with the 8 row columns as payload: no gather at all.
        def body(i, c):
            ids, rows = c
            cols = tuple(rows[:, j] for j in range(8))
            out = jax.lax.sort((ids,) + cols, num_keys=1)
            return (touch(ids, out[1][0]), rows)
        return body

    timed("layout minus member table", v_layout_no_member, carry0)
    timed("full group_by_bin (member kept)", v_full_layout, carry0)
    timed("argsort + rows[order] permute", v_row_permute, carry0)
    timed("argsort + jnp.take permute", v_sorted_take, carry0)
    timed("lax.sort rows as 8 payload columns", v_sort_rows_directly, carry0)
    timed("group_by_bin + gather_grouped (production)", v_gather_grouped,
          carry0)


if __name__ == "__main__":
    main()
