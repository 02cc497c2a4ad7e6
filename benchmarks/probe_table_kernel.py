"""Probe: padded bin-table build as a Pallas kernel vs the XLA row gather.

The grouping's dominant cost is the (n_r*cap, d) padded-table row gather
(~2/3 of grouping; profile_grouping3) — XLA lowers it as ~24.5k scattered
32 B row copies. But the positions are offsets[b] + c: each bin's slots
are a CONTIGUOUS run of the sorted rows, so a Pallas kernel with the
sorted array VMEM-resident can build the table as n_r dynamic slices —
tile-aligned vector copies when starts are 8-aligned (validity absorbs
the <8-row skew), shift-copies when unaligned.

Measures correctness + marginal latency of:
  (a) XLA production table gather,
  (b) Pallas table build, unaligned starts (drop-in semantics, cap=96),
  (c) Pallas table build, 8-aligned starts (capw=104, skew validity).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N_HI, N_LO = 200, 40
M, N_BINS, CAP = 16384, 256, 96
BB = 32


def _table_kernel(bb: int, capw: int):
    def kernel(starts_ref, rows_ref, out_ref):
        i = pl.program_id(0)
        for j in range(bb):
            st = starts_ref[i * bb + j]
            out_ref[j] = rows_ref[pl.ds(st, capw), :]
    return kernel


@functools.partial(jax.jit, static_argnames=("capw", "bb", "aligned"))
def bin_table_pallas(sorted_rows, starts, *, capw: int, bb: int = BB,
                     aligned: bool = False):
    """(n_r, capw, d) padded bin table from bin-major sorted rows.

    sorted_rows: (m_pad, d) — padded by >= capw rows so slices never
    overrun. starts: (n_r,) int32 slice starts (8-multiples when aligned).
    """
    m_pad, d = sorted_rows.shape
    n_r = starts.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r // bb,),
        in_specs=[pl.BlockSpec((m_pad, d), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bb, capw, d), lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _table_kernel(bb, capw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_r, capw, d), sorted_rows.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(starts, sorted_rows)


def main():
    rng = np.random.default_rng(0)
    m, n_bins, cap = M, N_BINS, CAP
    ids0 = jnp.asarray(rng.integers(0, n_bins, m, dtype=np.int32))
    rows0 = jnp.asarray(rng.normal(size=(m, 8)).astype(np.float32))

    def sort_pieces(ids, rows):
        iota = jnp.arange(m, dtype=jnp.int32)
        key = ids * jnp.int32(m) + iota
        skey = jax.lax.sort(key)
        sbin = skey // m
        sidx = skey - sbin * m
        starts = jnp.searchsorted(
            sbin, jnp.arange(n_bins, dtype=sbin.dtype), side="left"
        ).astype(jnp.int32)
        return jnp.take(rows, sidx, axis=0), starts

    # ---- correctness ----
    s_rows, starts = jax.jit(sort_pieces)(ids0, rows0)
    padded = jnp.concatenate([s_rows, jnp.zeros((cap + 16, 8))], 0)
    flat = jnp.minimum(
        starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :],
        m + cap - 1)
    ref_table = np.asarray(jnp.take(padded, flat.reshape(-1), axis=0)
                           .reshape(n_bins, cap, 8))

    got = np.asarray(bin_table_pallas(padded, starts, capw=cap))
    print("unaligned exact:", np.array_equal(got, ref_table), flush=True)

    starts8 = (starts // 8) * 8
    capw = cap + 8
    got8 = np.asarray(bin_table_pallas(padded, starts8, capw=capw))
    skew = np.asarray(starts - starts8)
    ok8 = all(
        np.array_equal(got8[b, skew[b]:skew[b] + cap], ref_table[b])
        for b in range(n_bins))
    print("aligned exact (after skew):", ok8, flush=True)

    # ---- marginal latency ----
    def timed(label, body, carry0, reps=3):
        @functools.partial(jax.jit, static_argnames=("n",))
        def run(c, n):
            return jax.lax.fori_loop(0, n, body, c)

        def t_of(n):
            out = run(carry0, n)
            float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = run(carry0, n)
                float(np.asarray(
                    jax.tree_util.tree_leaves(out)[0]).ravel()[0])
                ts.append(time.perf_counter() - t0)
            return min(ts)

        per = (t_of(N_HI) - t_of(N_LO)) / (N_HI - N_LO)
        print(f"{label:48s} {per*1e3:8.4f} ms/op", flush=True)

    def touch(ids, rows, x):
        return ((ids + x.astype(jnp.int32)) % n_bins,
                rows + (x * 1e-20).astype(rows.dtype))

    def whole(table_fn):
        def body(i, c):
            ids, rows = c
            s_rows, starts = sort_pieces(ids, rows)
            t = table_fn(s_rows, starts)
            return touch(ids, rows, t[0, 0, 0])
        return body

    def xla_table(s_rows, starts):
        padded = jnp.concatenate([s_rows, jnp.zeros((cap, 8))], 0)
        flat = jnp.minimum(
            starts[:, None] + jnp.arange(cap, dtype=jnp.int32)[None, :],
            m + cap - 1)
        return jnp.take(padded, flat.reshape(-1), axis=0).reshape(
            n_bins, cap, 8)

    def pallas_unaligned(s_rows, starts):
        padded = jnp.concatenate([s_rows, jnp.zeros((cap + 16, 8))], 0)
        return bin_table_pallas(padded, starts, capw=cap)

    def pallas_aligned(s_rows, starts):
        padded = jnp.concatenate([s_rows, jnp.zeros((cap + 16, 8))], 0)
        return bin_table_pallas(padded, (starts // 8) * 8, capw=cap + 8)

    carry0 = (ids0, rows0)
    timed("sort+take+counts + XLA table (prod)", whole(xla_table), carry0)
    timed("sort+take+counts + PALLAS unaligned", whole(pallas_unaligned),
          carry0)
    timed("sort+take+counts + PALLAS 8-aligned", whole(pallas_aligned),
          carry0)


if __name__ == "__main__":
    main()
