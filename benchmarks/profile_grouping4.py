"""Round-4 grouping attack candidates: the padded-table row gather is ~2/3
of the grouping cost (profile_grouping3) — these variants replace it with
(a) vmapped dynamic slices of the sorted rows (unaligned starts),
(b) 8-ALIGNED window starts (sublane-aligned dynamic slices; validity
    absorbs the <=7-row skew, capacity widens by 8),
(c) jnp.take without the reshape round-trip, clip mode (no pad concat).
Same fori_loop + host-read + marginal-differencing method as always.
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

    def sort_take(ids, rows):
        iota = jnp.arange(m, dtype=jnp.int32)
        key = ids * jnp.int32(m) + iota
        skey = jax.lax.sort(key)
        sbin = skey // m
        sidx = skey - sbin * m
        starts = jnp.searchsorted(
            sbin, jnp.arange(n_bins, dtype=sbin.dtype), side="left"
        ).astype(jnp.int32)
        ends = jnp.concatenate([starts[1:], jnp.full((1,), m, jnp.int32)])
        counts = ends - starts
        sorted_rows = jnp.take(rows, sidx, axis=0)
        return sorted_rows, counts, starts

    def v_dynslice():
        def body(i, c):
            ids, rows = c
            s, counts, starts = sort_take(ids, rows)
            padded = jnp.concatenate([s, jnp.zeros((cap, 8), s.dtype)], 0)
            grouped = jax.vmap(
                lambda off: jax.lax.dynamic_slice(padded, (off, 0), (cap, 8))
            )(starts)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_dynslice_aligned():
        capw = cap + 8
        def body(i, c):
            ids, rows = c
            s, counts, starts = sort_take(ids, rows)
            starts8 = (starts // 8) * 8
            padded = jnp.concatenate([s, jnp.zeros((capw, 8), s.dtype)], 0)
            grouped = jax.vmap(
                lambda off: jax.lax.dynamic_slice(padded, (off, 0), (capw, 8))
            )(starts8)
            skew = starts - starts8  # (n_bins,) in [0, 8)
            slot = jnp.arange(capw, dtype=jnp.int32)[None, :]
            valid = jnp.logical_and(
                slot >= skew[:, None],
                slot < skew[:, None] + jnp.minimum(counts, cap)[:, None])
            return touch(ids, rows,
                         grouped[0, 0, 0] + valid[0, 0].astype(rows.dtype))
        return body

    def v_take_clip_2d():
        def body(i, c):
            ids, rows = c
            s, counts, starts = sort_take(ids, rows)
            flat_pos = jnp.minimum(
                starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :],
                m - 1)
            grouped = jnp.take(s, flat_pos, axis=0)  # (n_bins, cap, 8)
            return touch(ids, rows, grouped[0, 0, 0] + counts[0])
        return body

    def v_production():
        from icp_tpu.rbc.grouping import group_rows_by_bin

        def body(i, c):
            ids, rows = c
            g = group_rows_by_bin(ids, n_bins, cap, (rows,))
            return touch(ids, rows, g.grouped[0][0, 0, 0]
                         + g.counts[0].astype(rows.dtype))
        return body

    timed("PRODUCTION (row-gather table)", v_production, carry0)
    timed("dyn-slice table (unaligned)", v_dynslice, carry0)
    timed("dyn-slice table (8-ALIGNED + skew validity)",
          v_dynslice_aligned, carry0)
    timed("take clip, 2-D positions, no pad", v_take_clip_2d, carry0)


if __name__ == "__main__":
    main()
