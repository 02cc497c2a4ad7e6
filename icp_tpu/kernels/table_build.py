"""Pallas TPU kernel: padded bin-table build from bin-major sorted rows.

The grouping's dominant cost is the (n_r * cap, d) padded-table build —
as an XLA row gather it lowers to ~24.5k scattered 32 B row copies
(~2/3 of the grouping block; benchmarks/profile_grouping3.py). But the
gather positions are ``starts[b] + c``: each bin's slots are a CONTIGUOUS
run of the sorted rows, so with the sorted array VMEM-resident the table
is n_r dynamic slices — vector copies, no per-row descriptors. Measured
(benchmarks/probe_table_kernel.py, v5e, marginal differencing): the
sort+counts+take+table chain drops 0.096 -> 0.075 ms/op, bit-exact.
(An 8-ALIGNED variant — align starts down to sublane boundaries and
absorb the <8-row skew in validity — measured WORSE, 0.106: the +8 wider
table costs more than the unaligned-start shifts; probe records both.)

The reference's analog is the RBC permutation step of its search
(kernels/scan_kernels.cl + rbc permute kernels, SURVEY.md §2.5) — this
kernel is the TPU-shaped final stage of that permutation.

The XLA twin (:func:`bin_table_ref`) is the production path on CPU
backends and the interpret-mode parity golden; both produce IDENTICAL
values (a permutation copy has no arithmetic).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.fused_step import _kernel_compiler_params

# VMEM budget for the full-array sorted-rows block: (m_pad, d) f32 tiles
# to ceil(m_pad/8) * 4 KB regardless of d<=128 (lane padding), i.e. ~8 MB
# at m=16384 and ~33 MB at the 4x m=65536 — within the raised 64 MB
# Mosaic limit but gated here so extreme shapes fall back to the XLA twin.
_TABLE_VMEM_BUDGET = 48 * 1024 * 1024


def _auto_bin_batch_table(n_r: int) -> int:
    """Bins per grid step: 32 divides every supported n_r >= 32 (grid
    amortization anchor, same as the moment kernels); full-dim below."""
    if n_r <= 32:
        return n_r
    for bb in (32, 16, 8):
        if n_r % bb == 0:
            return bb
    return 0


def table_kernel_fits(m: int, n_r: int, capacity: int, d: int) -> bool:
    """True when :func:`bin_table_pallas` has a legal VMEM-fitting shape
    (else callers use the XLA twin)."""
    if _auto_bin_batch_table(n_r) == 0:
        return False
    m_pad = _pad_rows(m, capacity)
    vmem = (m_pad // 8) * 8 * 128 * 4  # (8, 128)-tiled f32 block bytes
    return vmem <= _TABLE_VMEM_BUDGET


def _pad_rows(m: int, capacity: int) -> int:
    """Rows after slack padding: slices [start, start+capacity) must never
    overrun (start <= m), and the sublane dim must be a multiple of 8."""
    return ((m + capacity + 7) // 8) * 8


def _table_kernel(bb: int, capacity: int):
    def kernel(starts_ref, rows_ref, out_ref):
        i = pl.program_id(0)
        for j in range(bb):  # static unroll: bb dynamic-slice vector copies
            out_ref[j] = rows_ref[pl.ds(starts_ref[i * bb + j], capacity), :]
    return kernel


@functools.partial(jax.jit, static_argnames=("capacity", "bin_batch",
                                             "interpret"))
def bin_table_pallas(sorted_rows: jnp.ndarray, starts: jnp.ndarray, *,
                     capacity: int, bin_batch: int = 0,
                     interpret: bool = False) -> jnp.ndarray:
    """(n_r, capacity, d) padded bin table from bin-major sorted rows.

    Args:
      sorted_rows: (m, d) rows in bin-major (sorted) order — slot c of bin
        b reads row ``starts[b] + c`` (rows past a bin's count read the
        next bin's rows: garbage masked by the caller's validity, the same
        contract as the XLA row-gather this replaces).
      starts: (n_r,) int32 exclusive-prefix offsets (grouping offsets).
      capacity: static slots per bin.
      bin_batch: bins per grid step (0 = auto).
    """
    m, d = sorted_rows.shape
    n_r = starts.shape[0]
    if bin_batch == 0:
        bin_batch = _auto_bin_batch_table(n_r)
        assert bin_batch > 0, n_r
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    m_pad = _pad_rows(m, capacity)
    padded = jnp.concatenate(
        [sorted_rows, jnp.zeros((m_pad - m, d), sorted_rows.dtype)], axis=0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_r // bin_batch,),
        in_specs=[pl.BlockSpec((m_pad, d), lambda i, s: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((bin_batch, capacity, d),
                               lambda i, s: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _table_kernel(bin_batch, capacity),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_r, capacity, d),
                                       sorted_rows.dtype),
        compiler_params=_kernel_compiler_params(),
        interpret=interpret,
    )(starts, padded)


def _windowed_kernel(bb: int, capacity: int, w: int):
    def kernel(win_ref, starts_ref, a_ref, b_ref, out_ref, scratch_ref):
        i = pl.program_id(0)
        base = win_ref[i] * w
        for j in range(bb):  # static unroll
            rel = starts_ref[i * bb + j] - base
            # Fast paths: the bin's slice lies wholly in window A or B.
            # Crossing bins (one per W boundary at most) go through the
            # scratch concat. `rel` is guaranteed in [0, 2W - capacity]
            # by the caller's span check (else it uses the XLA twin).
            @pl.when(rel + capacity <= w)
            def _a():
                out_ref[j] = a_ref[pl.ds(rel, capacity), :]

            @pl.when(rel >= w)
            def _b():
                out_ref[j] = b_ref[pl.ds(rel - w, capacity), :]

            @pl.when((rel + capacity > w) & (rel < w))
            def _cross():
                scratch_ref[pl.ds(0, w), :] = a_ref[:]
                scratch_ref[pl.ds(w, w), :] = b_ref[:]
                out_ref[j] = scratch_ref[pl.ds(rel, capacity), :]
    return kernel


@functools.partial(jax.jit, static_argnames=("capacity", "bin_batch",
                                             "window", "interpret"))
def bin_table_windowed_pallas(sorted_rows: jnp.ndarray, starts: jnp.ndarray,
                              *, capacity: int, bin_batch: int = 8,
                              window: int = 0,
                              interpret: bool = False) -> jnp.ndarray:
    """Windowed variant of :func:`bin_table_pallas` for LARGE m.

    The full-VMEM kernel needs the whole (m, d) sorted array resident
    (~134 MB at the 16x shape m=262144 — over any VMEM budget), so big
    shapes fell back to the XLA row gather: 4.4 ms of the 16x iteration's
    13.6 (benchmarks/profile_grouping16x.py). Here the rows stream through
    TWO consecutive (W, d) VMEM windows whose position is chosen per grid
    step from the scalar-prefetched chunk starts (``win[i] =
    starts[i*bb] // W``) — offsets are monotone, so each step's bins live
    at [starts[i*bb], ..+span), and whenever span <= 2W - capacity every
    slice is a VMEM dynamic slice from window A or B (or, for the <= one
    boundary-crossing bin per window, from an A||B scratch concat).

    The span bound is data-dependent (bin counts are), so callers MUST
    check :func:`windowed_span_ok` and route overflowing layouts to the
    XLA twin (a skewed scene where one chunk swallows > 2W rows would
    otherwise read clamped garbage). `group_rows_by_bin` does this with a
    ``lax.cond`` — both paths compile, the check picks per dispatch.
    """
    m, d = sorted_rows.shape
    n_r = starts.shape[0]
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    if window == 0:
        # ~4x the mean chunk span, 8-aligned, at least 2 x capacity.
        mean_span = bin_batch * max(m // n_r, 1)
        window = max(((2 * mean_span + 7) // 8) * 8,
                     ((2 * capacity + 7) // 8) * 8)
    w = window
    n_chunks = n_r // bin_batch
    # Pad rows so window B never overruns: last base <= m, + 2W slack.
    m_pad = ((m + 2 * w + 7) // 8) * 8
    padded = jnp.concatenate(
        [sorted_rows, jnp.zeros((m_pad - m, d), sorted_rows.dtype)], axis=0)
    win = (starts[:: bin_batch] // w).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[
            pl.BlockSpec((w, d), lambda i, win, st: (win[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, d), lambda i, win, st: (win[i] + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bin_batch, capacity, d),
                               lambda i, win, st: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2 * w, d), sorted_rows.dtype)],
    )
    return pl.pallas_call(
        _windowed_kernel(bin_batch, capacity, w),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_r, capacity, d),
                                       sorted_rows.dtype),
        compiler_params=_kernel_compiler_params(),
        interpret=interpret,
    )(win, starts, padded, padded)


def windowed_span_ok(starts: jnp.ndarray, counts: jnp.ndarray,
                     capacity: int, bin_batch: int = 8,
                     window: int = 0, m: int = 0) -> jnp.ndarray:
    """Scalar bool: every chunk's span fits the windowed kernel's 2W
    coverage (see :func:`bin_table_windowed_pallas`). Cheap: O(n_r)."""
    n_r = starts.shape[0]
    if window == 0:
        mean_span = bin_batch * max(m // n_r, 1)
        window = max(((2 * mean_span + 7) // 8) * 8,
                     ((2 * capacity + 7) // 8) * 8)
    base = (starts[:: bin_batch] // window) * window
    last = starts[bin_batch - 1:: bin_batch]
    span = last + capacity - base
    return jnp.max(span) <= 2 * window


def bin_table_ref(sorted_rows: jnp.ndarray, starts: jnp.ndarray, *,
                  capacity: int) -> jnp.ndarray:
    """Plain-XLA twin (row gather at arithmetic positions) — the
    production path on CPU backends and the interpret-parity golden."""
    m, d = sorted_rows.shape
    n_r = starts.shape[0]
    padded = jnp.concatenate(
        [sorted_rows, jnp.zeros((capacity, d), sorted_rows.dtype)], axis=0)
    flat_pos = jnp.minimum(
        starts[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :],
        m + capacity - 1)
    return jnp.take(padded, flat_pos.reshape(-1), axis=0).reshape(
        n_r, capacity, d)
