"""Pallas TPU kernel: fused bin search + weighting + moment reduction.

One grid step does, per bin, the ENTIRE per-iteration data path after
grouping: scores on the MXU, argmin, correspondence weights, and the
statistical moments the Horn solve needs — emitting 20 floats per bin
instead of the (cq, 8) matched/query tensors. The step then assembles the
global S matrix and centroids from 256 rows of partials (see
icp_tpu.rbc.search.rbc_search_moments), so nothing per-point ever returns
to HBM.

Moment frame: per-bin centered on the representative (both sides), which
keeps every in-kernel quantity at offset scale (f32-safe); the caller
translates the partials back to the common frame with the representative
coordinates (exact algebra, tiny 256-row ops).

Per-bin outputs (lane-padded to 32):
    [0]      s0   = sum w
    [1:4]    sm   = sum w * m_c
    [4:7]    sf   = sum w * f_c
    [7:16]   smf  = sum w * outer(m_c, f_c)   (row-major, rows = m)
    [16]     sff  = sum w * |f_c|^2
    [17]     smm  = sum w * |m_c|^2
    [18]     nvalid = sum valid (diagnostic)
    [19]     reserved
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.bin_search import DEFAULT_BIN_BATCH

MOMENT_LANES = 32


def _make_kernel(weighted: bool):
    def kernel(qg_w_ref, bins_c_ref, sq_b_ref, sq_q_ref, qvalid_ref,
               out_ref):
        qg_w = qg_w_ref[:]          # (BB, cq, 8) metric-weighted centered m
        bins_c = bins_c_ref[:]      # (BB, cb, 8) centered f candidates

        cross = jax.lax.dot_general(
            qg_w, bins_c,
            dimension_numbers=(((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        scores = sq_b_ref[:][:, None, :] - 2.0 * cross  # (BB, cq, cb)

        best_slot = jnp.argmin(scores, axis=-1)  # (BB, cq)
        best_score = jnp.min(scores, axis=-1)

        cb = bins_c.shape[1]
        slot_ids = jax.lax.broadcasted_iota(
            jnp.int32, best_slot.shape + (cb,), 2)
        one_hot = (slot_ids == best_slot[..., None]).astype(jnp.float32)
        # Centered matched candidate per query (geometry is unscaled in the
        # metric weights, so lanes 0:3 are plain f_c).
        matched_c = jax.lax.dot_general(
            one_hot, bins_c,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (BB, cq, 8)

        d2 = jnp.maximum(best_score + sq_q_ref[:], 0.0)
        valid = qvalid_ref[:] * jnp.isfinite(best_score).astype(jnp.float32)
        if weighted:
            w = valid * (100.0 / (100.0 + d2))
        else:
            w = valid

        m_c = qg_w[..., :3]          # geometric lanes are metric-weight 1
        f_c = matched_c[..., :3]
        mw = m_c * w[..., None]      # (BB, cq, 3)

        s0 = jnp.sum(w, axis=1)                       # (BB,)
        sm = jnp.sum(mw, axis=1)                      # (BB, 3)
        sf = jnp.sum(f_c * w[..., None], axis=1)      # (BB, 3)
        # The 9 cross-covariance entries as direct (BB, cq) reductions —
        # Mosaic cannot shape-cast a (BB, 3, 3) batched-dot result to
        # (BB, 9) in-kernel, and 9 VPU reduces of 128-lane rows are cheap.
        smf_cols = [
            jnp.sum(mw[..., i] * f_c[..., j], axis=1)[:, None]
            for i in range(3) for j in range(3)
        ]
        sff = jnp.sum(w * jnp.sum(f_c * f_c, axis=-1), axis=1)  # (BB,)
        smm = jnp.sum(w * jnp.sum(m_c * m_c, axis=-1), axis=1)
        nvalid = jnp.sum(valid, axis=1)

        bb = s0.shape[0]
        out = jnp.concatenate(
            [s0[:, None], sm, sf] + smf_cols + [sff[:, None],
             smm[:, None], nvalid[:, None],
             jnp.zeros((bb, MOMENT_LANES - 19), jnp.float32)],
            axis=1,
        )
        out_ref[:] = out

    return kernel


@functools.partial(jax.jit, static_argnames=("weighted", "bin_batch",
                                             "interpret"))
def bin_moments_pallas(qg_w: jnp.ndarray, bins_c: jnp.ndarray,
                       sq_b_masked: jnp.ndarray, sq_q: jnp.ndarray,
                       qvalid: jnp.ndarray, *, weighted: bool,
                       bin_batch: int = DEFAULT_BIN_BATCH,
                       interpret: bool = False) -> jnp.ndarray:
    """Fused search+weights+moments.

    Args:
      qg_w: (n_r, cq, 8) metric-weighted per-bin-centered queries.
      bins_c: (n_r, cb, 8) centered bin points.
      sq_b_masked: (n_r, cb) masked |b|^2 (+inf invalid/zero-geometry).
      sq_q: (n_r, cq) weighted |q_c|^2 per query slot.
      qvalid: (n_r, cq) f32 slot validity (incl. moving zero-geometry
        discard).
      weighted: reference WEIGHTED vs REGULAR residual weighting.
    Returns:
      (n_r, MOMENT_LANES) per-bin moment rows (layout in module docstring).
    """
    n_r, cq, d = qg_w.shape
    cb = bins_c.shape[1]
    bin_batch = min(bin_batch, n_r)
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    grid = (n_r // bin_batch,)

    def idx3(i):
        return (i, 0, 0)

    def idx2(i):
        return (i, 0)

    return pl.pallas_call(
        _make_kernel(weighted),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bin_batch, cq, d), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, d), idx3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cq), idx2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cq), idx2, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bin_batch, MOMENT_LANES), idx2,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, MOMENT_LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_r * cq * cb * d * 4,
            bytes_accessed=4 * n_r * (cq * d + cb * d + cb + 2 * cq
                                      + MOMENT_LANES),
            transcendentals=0,
        ),
        interpret=interpret,
    )(qg_w, bins_c, sq_b_masked, sq_q, qvalid)
