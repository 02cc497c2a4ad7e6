"""Round-4 grouping decomposition at the PRODUCTION shapes (cq=96, the
flagship query capacity — earlier probes used cap=128) + the not-yet-
measured layout variants: one-step member gather, row-scatter table build,
and a no-grouping floor for attribution.

Method identical to profile_grouping2: jitted fori_loop with data
dependencies between iterations, forced host read, marginal (T_hi - T_lo)
differencing. Run serially on the chip.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

N_HI, N_LO = 200, 40
M, N_BINS, CAP = 16384, 256, 96


def timed(label, body_builder, carry0, reps=3):
    from functools import partial

    @partial(jax.jit, static_argnames=("n",))
    def run(c, n):
        return jax.lax.fori_loop(0, n, body_builder(), c)

    def t_of(n):
        out = run(carry0, n)
        first = jax.tree_util.tree_leaves(out)[0]
        float(np.asarray(first).ravel()[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(carry0, n)
            first = jax.tree_util.tree_leaves(out)[0]
            float(np.asarray(first).ravel()[0])
            ts.append(time.perf_counter() - t0)
        return min(ts)

    per_op = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
    print(f"{label:56s} {per_op*1e3:8.4f} ms/op", flush=True)


def main():
    rng = np.random.default_rng(0)
    ids0 = jnp.asarray(rng.integers(0, N_BINS, M, dtype=np.int32))
    rows0 = jnp.asarray(rng.normal(size=(M, 8)).astype(np.float32))
    carry0 = (ids0, rows0)
    m, n_bins, cap = M, N_BINS, CAP

    def touch(ids, rows, x):
        return ((ids + x.astype(jnp.int32)) % n_bins,
                rows + (x * 1e-20).astype(rows.dtype))

    def sort_key(ids):
        iota = jnp.arange(m, dtype=jnp.int32)
        key = ids * jnp.int32(m) + iota
        skey = jax.lax.sort(key)
        sbin = skey // m
        return sbin, skey - sbin * m

    def counts_offsets_sorted(sbin):
        starts = jnp.searchsorted(
            sbin, jnp.arange(n_bins, dtype=sbin.dtype), side="left"
        ).astype(jnp.int32)
        ends = jnp.concatenate([starts[1:], jnp.full((1,), m, jnp.int32)])
        counts = ends - starts
        return counts, starts

    def v_production():
        from icp_tpu.rbc.grouping import group_rows_by_bin

        def body(i, c):
            ids, rows = c
            g = group_rows_by_bin(ids, n_bins, cap, (rows,))
            return touch(ids, rows, g.grouped[0][0, 0, 0]
                         + g.counts[0].astype(rows.dtype))
        return body

    def v_sort_only():
        def body(i, c):
            ids, rows = c
            sbin, sidx = sort_key(ids)
            return touch(ids, rows, (sidx[0] + sbin[0]).astype(rows.dtype))
        return body

    def v_sort_counts():
        def body(i, c):
            ids, rows = c
            sbin, sidx = sort_key(ids)
            counts, starts = counts_offsets_sorted(sbin)
            return touch(ids, rows, (sidx[0] + counts[0]).astype(rows.dtype))
        return body

    def v_sort_counts_take():
        def body(i, c):
            ids, rows = c
            sbin, sidx = sort_key(ids)
            counts, starts = counts_offsets_sorted(sbin)
            sorted_rows = jnp.take(rows, sidx, axis=0)
            return touch(ids, rows, sorted_rows[0, 0] + counts[0])
        return body

    def v_onestep_member():
        # table = rows[sidx_padded[flat_pos]] — ONE row gather, but the
        # member build is a 1-lane 24.5k gather.
        def body(i, c):
            ids, rows = c
            sbin, sidx = sort_key(ids)
            counts, starts = counts_offsets_sorted(sbin)
            flat_pos = (starts[:, None]
                        + jnp.arange(cap, dtype=jnp.int32)[None, :])
            flat_pos = jnp.minimum(flat_pos, m - 1)
            member = jnp.take(sidx, flat_pos.reshape(-1))
            grouped = jnp.take(rows, member, axis=0).reshape(n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_scatter_table():
        # table.at[dst].set(sorted_rows): row scatter at rank positions.
        def body(i, c):
            ids, rows = c
            sbin, sidx = sort_key(ids)
            counts, starts = counts_offsets_sorted(sbin)
            sorted_rows = jnp.take(rows, sidx, axis=0)
            j = jnp.arange(m, dtype=jnp.int32)
            rank = j - starts[sbin]
            dst = jnp.where(rank < cap, sbin * cap + rank, n_bins * cap)
            table = jnp.zeros((n_bins * cap + 1, 8), rows.dtype)
            table = table.at[dst].set(sorted_rows, mode="drop")
            grouped = table[:-1].reshape(n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_scatter_direct():
        # Scatter ORIGINAL rows (no sorted_rows materialization): rank via
        # starts gathered per original point (1-lane 16k gather of a
        # 256-elem array) — dst[i] = rid*cap + (pos_in_sort - start).
        def body(i, c):
            ids, rows = c
            sbin, sidx = sort_key(ids)
            counts, starts = counts_offsets_sorted(sbin)
            j = jnp.arange(m, dtype=jnp.int32)
            rank_sorted = j - starts[sbin]
            dst_sorted = jnp.where(rank_sorted < cap,
                                   sbin * cap + rank_sorted, n_bins * cap)
            # invert the permutation: dst in ORIGINAL order via scatter of
            # int (1-lane scatter, likely slow — measuring anyway)
            dst = jnp.zeros((m,), jnp.int32).at[sidx].set(dst_sorted)
            table = jnp.zeros((n_bins * cap + 1, 8), rows.dtype)
            table = table.at[dst].set(rows, mode="drop")
            grouped = table[:-1].reshape(n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_floor_no_grouping():
        # Attribution floor: fake "grouping" by reshape (wrong values, same
        # shapes) — what the iteration would cost if grouping were free.
        def body(i, c):
            ids, rows = c
            pad = jnp.zeros((n_bins * cap - m, 8), rows.dtype)
            grouped = jnp.concatenate([rows, pad], 0).reshape(
                n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0])
        return body

    timed("PRODUCTION group_rows_by_bin cq=96", v_production, carry0)
    timed("sort only", v_sort_only, carry0)
    timed("sort + counts(searchsorted)", v_sort_counts, carry0)
    timed("sort + counts + take(rows, sidx)", v_sort_counts_take, carry0)
    timed("one-step member gather", v_onestep_member, carry0)
    timed("scatter table from sorted rows", v_scatter_table, carry0)
    timed("scatter table direct (inverse perm)", v_scatter_direct, carry0)
    timed("floor: reshape only", v_floor_no_grouping, carry0)


if __name__ == "__main__":
    main()
