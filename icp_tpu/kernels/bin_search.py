"""Pallas TPU kernel: fused per-bin RBC exhaustive search.

Replaces the XLA chain  einsum -> broadcast-add -> argmin/min ->
take_along_axis  of the grouped search (icp_tpu.rbc.search), which
materializes the (n_r, cq, cb) score tensor in HBM (~16 MB at the flagship
shape) and re-reads it for every consumer. Here each grid step processes a
batch of bins entirely in VMEM:

    scores   = sq_b_masked - 2 * (q_w @ bins_c^T)     (MXU, f32 passes)
    best     = argmin/min over the bin axis            (VPU, in VMEM)
    matched  = one_hot(best) @ bins                    (MXU — no gather)

HBM traffic per iteration drops to the inputs + (cq, 8)-sized outputs.

The kernel is exact-equivalent to the XLA path (same centered quadratic
expansion, same +inf masking via sq_b_masked) and runs under
``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.fused_step import dot3

# Bins processed per grid step: amortizes grid/dispatch overhead while
# keeping VMEM usage ~1-2 MB per step at cq = cb = 128.
DEFAULT_BIN_BATCH = 32


def _auto_bin_batch(n_r: int, cq: int, cb: int, v: int) -> int:
    """Largest LEGAL power-of-two bin batch (<= DEFAULT_BIN_BATCH) dividing
    n_r whose Mosaic stack stays under the 16 MB scoped-VMEM limit.
    Anchored on measurement: bin_batch=32 at cq=cb=128, v=12 allocates
    18.56 MB (~34 B per bin-slot-pair for the dot3 splits + score/one-hot
    temporaries, plus the payload gather).

    Legality: the (bin_batch, cb)/(bin_batch, cq) 2-D blocks put bin_batch
    in the SUBLANE dim — Mosaic requires a multiple of 8 or the full array
    dim. Returns 0 when no legal batch fits (callers fall back to the
    identical-math XLA path in rbc.search.bin_phase2)."""
    per_bin = 34 * cq * cb + 16 * cb * v
    budget = 15 * 1024 * 1024
    # Full-dim block is always Mosaic-legal; else only multiples of 8 that
    # divide n_r (explicit candidates — halving a non-power-of-two start
    # like 24 lands on illegal sublane sizes like 12).
    if n_r <= DEFAULT_BIN_BATCH and n_r * per_bin <= budget:
        return n_r
    for bb in (32, 16, 8):
        if bb <= n_r and n_r % bb == 0 and bb * per_bin <= budget:
            return bb
    return 0


def search_kernel_fits(n_r: int, cq: int, cb: int, v: int) -> bool:
    """True when :func:`bin_search_pallas` has a legal VMEM-fitting auto
    bin batch at this shape."""
    return _auto_bin_batch(n_r, cq, cb, v) > 0


def _bin_search_kernel(qg_w_ref, bins_c_ref, sq_b_ref, vals_ref,
                       score_ref, matched_ref):
    """One grid step: BB bins of the grouped search, fully in VMEM.

    Shapes (BB = bin batch, cq = query capacity, cb = bin capacity,
    V = per-point payload width — 8 for points alone, 8 + padded normals
    when the point-to-plane objective needs them):
      qg_w_ref:    (BB, cq, 8)  metric-weighted centered queries
      bins_c_ref:  (BB, cb, 8)  centered bin points
      sq_b_ref:    (BB, cb)     masked |b|^2 row (+inf on invalid slots)
      vals_ref:    (BB, cb, V)  per-point payload (for the matched gather)
      score_ref:   (BB, cq)     out: winning score (sq_b - 2 q.b)
      matched_ref: (BB, cq, V)  out: winning payload
    """
    qg_w = qg_w_ref[:]
    bins_c = bins_c_ref[:]

    # (BB, cq, cb) scores on the MXU at bf16x3 (see fused_step.dot3): error
    # at the f32 ulp level for these centered-offset magnitudes — a SINGLE
    # bf16 pass would break the NN ordering of the cancelled quadratic
    # expansion, but 3 passes keep it, and this K=8 contraction runs at
    # 1/16 MXU utilization where pass count is the entire cost (HIGHEST's
    # 6 passes measured ~2x slower at the 4x workload).
    cross = dot3(qg_w, bins_c, (((2,), (2,)), ((0,), (0,))),
                 in_kernel=True)
    scores = sq_b_ref[:][:, None, :] - 2.0 * cross

    best_slot = jnp.argmin(scores, axis=-1)  # (BB, cq)
    score_ref[:] = jnp.min(scores, axis=-1)

    # Matched payload via one-hot matmul — VMEM-resident, no dynamic gather.
    cb = bins_c.shape[1]
    slot_ids = jax.lax.broadcasted_iota(jnp.int32, best_slot.shape + (cb,), 2)
    one_hot = (slot_ids == best_slot[..., None]).astype(jnp.float32)
    # HIGHEST: the payload carries raw coordinates (~2e3 mm); a single
    # bf16 pass quantizes them to ~8 mm steps (rendered-pair PLANE gate
    # measures the difference as 0.333 vs 0.321 mm). Within-window A/B
    # shows HIGHEST costs nothing measurable against the chip's ~±3%
    # run noise (cross-hour comparisons are invalid — the tunneled chip's
    # throughput drifts ~25% between sessions), so take the exact gather.
    matched_ref[:] = jax.lax.dot_general(
        one_hot, vals_ref[:],
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("bin_batch", "interpret"))
def bin_search_pallas(qg_w: jnp.ndarray, bins_c: jnp.ndarray,
                      sq_b_masked: jnp.ndarray, vals: jnp.ndarray,
                      *, bin_batch: int = 0,
                      interpret: bool = False):
    """Fused grouped bin search.

    Args:
      qg_w: (n_r, cq, 8) metric-weighted per-bin-centered queries.
      bins_c: (n_r, cb, 8) centered bin points.
      sq_b_masked: (n_r, cb) masked |b|^2 (+inf on invalid slots).
      vals: (n_r, cb, V) per-point payload returned for the winner — the raw
        bin points (V = 8), optionally concatenated with surface normals for
        the point-to-plane objective.
      bin_batch: bins per grid step (0 = VMEM-aware auto; must divide n_r).
      interpret: run in the Pallas interpreter (CPU tests).
    Returns:
      (best_score (n_r, cq), matched (n_r, cq, V)).
    """
    n_r, cq, d = qg_w.shape
    cb = bins_c.shape[1]
    v = vals.shape[2]
    if bin_batch == 0:
        bin_batch = _auto_bin_batch(n_r, cq, cb, v)
        if bin_batch == 0:
            raise ValueError(
                f"no legal VMEM-fitting bin batch at n_r={n_r}, cq={cq}, "
                f"cb={cb}, v={v}; gate on search_kernel_fits() and use the "
                "XLA path in rbc.search.bin_phase2 instead")
    bin_batch = min(bin_batch, n_r)
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    grid = (n_r // bin_batch,)

    def idx(i):
        return (i, 0, 0)

    def idx2(i):
        return (i, 0)

    return pl.pallas_call(
        _bin_search_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bin_batch, cq, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, d), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, v), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bin_batch, cq), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cq, v), idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_r, cq), jnp.float32),
            jax.ShapeDtypeStruct((n_r, cq, v), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * n_r * cq * cb * d * 3 + 2 * n_r * cq * cb * v,
            bytes_accessed=4 * n_r * (cq * d + cb * d + cb * v + cb + cq * v),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qg_w, bins_c, sq_b_masked, vals)
