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


def main2():
    """Round 2: loop-VARYING rows (the production regime — rows are the
    transformed queries, recomputed every iteration)."""
    from icp_tpu.rbc.grouping import group_rows_by_bin

    m, n_bins, cap = 16384, 256, 128
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, n_bins, m, dtype=np.int32))
    rows0 = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    carry0 = (ids0, rows0)

    def touch(ids, rows, x):
        # Make BOTH ids and rows depend on the previous iteration.
        return ((ids + x.astype(jnp.int32)) % n_bins,
                rows + (x * 1e-20).astype(rows.dtype))

    def v_payload_sort():
        def body(i, c):
            ids, rows = c
            g = group_rows_by_bin(ids, n_bins, cap, (rows,))
            return touch(ids, rows, g.grouped[0][0, 0, 0])
        return body

    def v_composite_key():
        def body(i, c):
            ids, rows = c
            iota = jnp.arange(m, dtype=jnp.int32)
            key = ids * jnp.int32(m) + iota
            skey = jax.lax.sort(key)
            sidx = skey - (skey // m) * m
            sorted_rows = jnp.take(rows, sidx, axis=0)
            counts = jnp.sum(
                (ids[None, :] == jnp.arange(n_bins, dtype=ids.dtype)[:, None])
                .astype(jnp.int32), axis=1)
            offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
            pad = jnp.zeros((cap, 8), rows.dtype)
            padded = jnp.concatenate([sorted_rows, pad], axis=0)
            grouped = jax.vmap(
                lambda off: jax.lax.dynamic_slice(padded, (off, 0), (cap, 8))
            )(offsets)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_old_member_path():
        from icp_tpu.rbc.grouping import group_by_bin, gather_grouped

        def body(i, c):
            ids, rows = c
            g = group_by_bin(ids, n_bins, cap)
            qg = gather_grouped(g, rows)
            return touch(ids, rows, qg[0, 0, 0])
        return body

    def v_composite_key_no_slices():
        # isolate: sort + take only
        def body(i, c):
            ids, rows = c
            iota = jnp.arange(m, dtype=jnp.int32)
            key = ids * jnp.int32(m) + iota
            skey = jax.lax.sort(key)
            sidx = skey - (skey // m) * m
            sorted_rows = jnp.take(rows, sidx, axis=0)
            return touch(ids, rows, sorted_rows[0, 0])
        return body

    timed("VARY payload sort (current prod)", v_payload_sort, carry0)
    timed("VARY composite-key sort + take + slices", v_composite_key, carry0)
    timed("VARY composite-key sort + take only", v_composite_key_no_slices,
          carry0)
    timed("VARY old member-table path", v_old_member_path, carry0)




def main3():
    """Round 3: split counts vs table build; arithmetic row-gather table."""
    m, n_bins, cap = 16384, 256, 128
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, n_bins, m, dtype=np.int32))
    rows0 = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))
    carry0 = (ids0, rows0)

    def touch(ids, rows, x):
        return ((ids + x.astype(jnp.int32)) % n_bins,
                rows + (x * 1e-20).astype(rows.dtype))

    def sort_take(ids, rows):
        iota = jnp.arange(m, dtype=jnp.int32)
        key = ids * jnp.int32(m) + iota
        skey = jax.lax.sort(key)
        sidx = skey - (skey // m) * m
        return jnp.take(rows, sidx, axis=0)

    def counts_offsets(ids):
        counts = jnp.sum(
            (ids[None, :] == jnp.arange(n_bins, dtype=ids.dtype)[:, None])
            .astype(jnp.int32), axis=1)
        offsets = (jnp.cumsum(counts) - counts).astype(jnp.int32)
        return counts, offsets

    def v_sort_take_counts():
        def body(i, c):
            ids, rows = c
            s = sort_take(ids, rows)
            counts, offsets = counts_offsets(ids)
            return touch(ids, rows, s[0, 0] + counts[0] + offsets[0])
        return body

    def v_rowgather_table():
        def body(i, c):
            ids, rows = c
            s = sort_take(ids, rows)
            counts, offsets = counts_offsets(ids)
            pad = jnp.zeros((cap, 8), rows.dtype)
            padded = jnp.concatenate([s, pad], axis=0)
            flat_pos = (offsets[:, None]
                        + jnp.arange(cap, dtype=jnp.int32)[None, :])
            flat_pos = jnp.minimum(flat_pos, m + cap - 1)
            grouped = jnp.take(padded, flat_pos.reshape(-1), axis=0)
            grouped = grouped.reshape(n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_onestep_rowgather():
        # skip the take: compose the two row gathers into one
        def body(i, c):
            ids, rows = c
            iota = jnp.arange(m, dtype=jnp.int32)
            key = ids * jnp.int32(m) + iota
            skey = jax.lax.sort(key)
            sidx = skey - (skey // m) * m          # (m,) original index, bin-major
            counts, offsets = counts_offsets(ids)
            flat_pos = (offsets[:, None]
                        + jnp.arange(cap, dtype=jnp.int32)[None, :])
            flat_pos = jnp.minimum(flat_pos, m - 1)
            member = jnp.take(sidx, flat_pos.reshape(-1))  # 1-D gather (32k)
            grouped = jnp.take(rows, member, axis=0).reshape(n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    timed("VARY sort+take+counts (no table)", v_sort_take_counts, carry0)
    timed("VARY row-gather table", v_rowgather_table, carry0)
    timed("VARY one-step (1-D member gather) table", v_onestep_rowgather,
          carry0)


if __name__ == "__main__":
    import sys
    if "--vary3" in sys.argv:
        main3()
    elif "--vary" in sys.argv:
        main2()
    else:
        main()
