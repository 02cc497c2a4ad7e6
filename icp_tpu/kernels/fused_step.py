"""Pallas TPU kernels: the fully-fused POINT-objective hot loop.

Round-1 profiling (benchmarks/profile_step_stages.py, v5e) of a ~0.57 ms
ICP iteration: the search chain (transform, rep assignment, grouping,
bin search) accounted for ~0.23 ms and the POST-search tail — weights,
centroids, deviations, S-matrix, each a separate XLA pass over
(n_r*cq, 8) arrays whose 8-lane rows pad to the 128-lane TPU tile (16x
HBM inflation per pass) — for ~0.34 ms. These kernels collapse the whole
iteration into two passes:

1. ``rep_assign_pallas`` — the reference's transform kernel + RBC
   nearest-representative phase (icpTransform_Quaternion,
   kernels/icp_kernels.cl:771-802, followed by the RBC search's
   query->representative distances) in ONE matmul: the accumulated
   similarity, the metric weighting, and the representative centering all
   fold into a precomputed (8, n_r) matrix C and an (1, n_r) row of
   per-representative constants (see :func:`prep_rep_assign`), so the
   kernel is ``argmin(srow - 2 p @ C)`` — the (m, n_r) score tensor never
   touches HBM.

2. ``bin_point_moments_pallas`` — per-bin exhaustive search (MXU scores +
   argmin + one-hot matched gather, exactly like kernels.bin_search)
   IMMEDIATELY reduced to one 8x8 weighted second-moment matrix per bin
   via a single batched MXU ``dot_general`` contracting the query axis::

       u_i = [m_cx, m_cy, m_cz, 1, f_cx, f_cy, f_cz, 1]
       P_b = sum_i w_i * u_i u_i^T                       (8, 8)

   The homogeneous lanes make P_b carry EVERY statistic the Horn solve
   needs: sum(w) at [3,3], the weighted centroid sums in row/column 3,
   the 3x3 cross-covariance block at [0:3, 4:7], and the deviation
   energies on the diagonal blocks — so nothing per-point ever returns to
   HBM (per-iteration output: (n_r, 8, 8), ~1 MB padded vs ~70 MB of
   padded per-point tensors on the unfused path). This is the
   Mosaic-friendly reduction layout round-1's ``bin_moments`` kernel
   lacked: it emitted 19 scalar column-reductions per bin (relayout-heavy
   VPU work, measured SLOWER than unfused); one batched 8x8 dot_general
   is a native MXU op.

Both kernels apply the accumulated similarity IN-KERNEL as an 8x8 matmul
(rigid+scale embeds in the top-left 3x3 of an identity, photometric lanes
pass through — :func:`prep_similarity`), so per-iteration HBM traffic
drops to: moving8 read twice (assign + grouping gather), the grouped
query table, the bin tables, and the tiny moment output.

Moment frame: per-bin centered on the representative (both sides), which
keeps every in-kernel product at offset scale (f32-safe); the caller
translates the per-bin partials back to the common frame with exact
algebra over n_r rows (:func:`point_moments_from_P` — same translation
the reference's c-scaling trick addresses, kernels/icp_kernels.cl:609-613).

``*_ref`` twins implement the identical math in plain XLA — they ARE the
production path on CPU backends and the goldens for interpret-mode kernel
parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.icp.quaternion import quat_to_matrix
from icp_tpu.ops.moments import robust_factor

DEFAULT_BLOCK_M = 2048
DEFAULT_BIN_BATCH = 32

# Mosaic's DEFAULT scoped-VMEM limit (~16 MB) is a compiler default, not
# the chip's physical VMEM — the round-3 probe (benchmarks/
# probe_vmem_limit.py) compiled every production kernel up to ~45 MB
# stacks on the v5e once the limit was raised per-kernel via
# pltpu.CompilerParams(vmem_limit_bytes=...). All production pallas_calls
# raise it to KERNEL_VMEM_LIMIT; the _auto_* policies gate batch sizes
# against _STACK_BUDGET so the XLA-twin fallback behavior at huge
# capacities is preserved. Batch PREFERENCE is by measured FULL-ITERATION
# cost, which inverts isolated-kernel rankings (composition effects):
# POINT bb=64 wins a kernel-only scan loop 0.098 vs 0.138 ms, yet loses
# the registration A/B 0.391 vs 0.364 ms/iteration — so 32 stays the
# leading candidate and the raised limit's production win is admitting
# previously-over-limit shapes (fused_gn: plane bb=32, 17.8 MB stack,
# -5% iteration) rather than giant batches here.
KERNEL_VMEM_LIMIT = 64 * 1024 * 1024
_STACK_BUDGET = 32 * 1024 * 1024

_HI = jax.lax.Precision.HIGHEST


def _kernel_compiler_params(vmem_limit_bytes: int = 0):
    """CompilerParams raising Mosaic's scoped-VMEM limit (0 = policy
    default KERNEL_VMEM_LIMIT)."""
    return pltpu.CompilerParams(
        vmem_limit_bytes=vmem_limit_bytes or KERNEL_VMEM_LIMIT)


def dot3(a: jnp.ndarray, b: jnp.ndarray, dims, *,
         in_kernel: bool = False) -> jnp.ndarray:
    """bf16x3 matmul (the classic 3-pass f32 emulation) for SCORE tensors.

    Score matmuls (rep assignment, per-bin cross terms) feed an ARGMIN,
    not the moment accumulation, so bf16x3 — whose error sits at the f32
    ulp level for these centered-offset magnitudes — is plenty; a single
    bf16 pass would NOT be (it would scramble the NN ordering of the
    cancelled quadratic expansion). These are K=8 contractions at 1/16 MXU
    utilization where pass count is the entire cost: HIGHEST (bf16x6)
    measured ~2x slower at the 4x workload for zero extra argmin fidelity.

    The split needs two implementations (``in_kernel`` selects; call sites
    inside Pallas kernel bodies MUST pass True, XLA twins False):

    - XLA path: the hi part is anchored with ``lax.reduce_precision``
      (an op XLA always honors). The naive ``a - (f32)(bf16)a`` split is
      FOLDED AWAY by XLA under ``--xla_allow_excess_precision`` (which the
      TPU relay pins): the bf16 round-trips collapse, the three passes
      become one DEFAULT-precision (single-bf16) matmul, and rep
      assignment picks wrong representatives at ~2% of queries with score
      errors ~3e-3 relative — caught on hardware by the
      benchmarks/smoke_fused_hw.py parity sweep (the Pallas kernels were
      right; the production XLA fallbacks were wrong).
    - Kernel path: Mosaic lowers neither ``reduce_precision`` nor the
      algorithm presets, but it also performs no excess-precision folding
      of the explicit cast split (verified on hardware: assignment
      matches the f64 reference to tie level, ~2e-4).

    Both compute identical values when nothing folds: reduce_precision(a,
    8, 7) rounds exactly like ``astype(bf16)`` (RN to the same 8-bit
    mantissa), so CPU tests see bitwise-equal paths. The a_lo x b_lo term
    (~2^-32 relative) is dropped in both.
    """
    if in_kernel:
        a_hi_f = a.astype(jnp.bfloat16).astype(jnp.float32)
        b_hi_f = b.astype(jnp.bfloat16).astype(jnp.float32)
    else:
        a_hi_f = jax.lax.reduce_precision(a, 8, 7)
        b_hi_f = jax.lax.reduce_precision(b, 8, 7)
    a_hi = a_hi_f.astype(jnp.bfloat16)
    a_lo = (a - a_hi_f).astype(jnp.bfloat16)
    b_hi = b_hi_f.astype(jnp.bfloat16)
    b_lo = (b - b_hi_f).astype(jnp.bfloat16)

    def f(x, y):
        return jax.lax.dot_general(x, y, dims,
                                   preferred_element_type=jnp.float32)

    return f(a_hi, b_hi) + f(a_hi, b_lo) + f(a_lo, b_hi)


def _auto_block_m(m: int, n_r: int) -> int:
    """Largest power-of-two block (<= DEFAULT_BLOCK_M) dividing m whose
    (block_m, n_r) f32 score tensor stays within ~8 MB of VMEM — at the
    flagship n_r=256 this is the measured-good 2048 (2048/4096/8192 are
    an alternating-A/B wash there, benchmarks/probe_assign_ab.py), and at
    n_r=1024 it keeps block_m=2048 (8 MB): the round-2 2 MB cap forced
    block_m=512 there — 128 grid steps — which the round-4 alternating
    A/B at 65536x1024 measured ~2% slower composed than 2048/4096 (every
    pair; median +0.033 ms/iter). The old "8 MB serializes" note was a
    16 MB-Mosaic-limit observation; under the raised 64 MB limit
    (KERNEL_VMEM_LIMIT) double-buffering headroom is no longer the
    binding constraint."""
    bm = DEFAULT_BLOCK_M
    limit = max(128, (8 * 1024 * 1024) // (n_r * 4))
    while bm > 128 and (bm > limit or m % bm != 0):
        bm //= 2
    return max(bm, 1) if m % max(bm, 1) == 0 else m


def _auto_bin_batch(n_r: int, cq: int, cb: int) -> int:
    """MEASURED-fastest legal bin batch for the POINT moment kernel.

    bb=32 is the measured full-iteration optimum (0.364 ms/iteration vs
    0.391 at bb=64 in the round-3 same-process registration A/B — even
    though bb=64 wins the ISOLATED kernel scan 0.098 vs 0.138 ms; batch
    preference must be judged composed, not kernel-only). Candidates are
    gated by the ~28 B-per-bin-slot-pair stack model against
    _STACK_BUDGET (minus the (n_r, 8, 128)-padded output XLA may pin in
    VMEM) so extreme-capacity shapes keep falling back to the XLA twin.

    Legality: the kernel's 2-D inputs get (bin_batch, cq)-shaped blocks
    whose SUBLANE dim is bin_batch — Mosaic requires it to be a multiple
    of 8 or equal to the full array dim (n_r). Returns 0 when no legal
    batch fits the stack budget (big-capacity shapes, e.g. mean occupancy
    >= 256); callers fall back to the identical-math XLA twin."""
    out_bytes = n_r * 8 * 128 * 4
    budget = _STACK_BUDGET - out_bytes
    per_bin = 28 * cq * cb
    # Full-dim block is always Mosaic-legal (sublane == array dim); capped
    # at DEFAULT_BIN_BATCH (the measured grid-amortization anchor).
    if n_r <= DEFAULT_BIN_BATCH and n_r * per_bin <= budget:
        return n_r
    # Otherwise only multiples of 8 that divide n_r are legal — explicit
    # candidates, NOT halving (halving a non-power-of-two start like 24
    # lands on illegal sublane sizes like 12).
    for bb in (32, 16, 8):
        if bb <= n_r and n_r % bb == 0 and bb * per_bin <= budget:
            return bb
    return 0


def moments_kernel_fits(n_r: int, cq: int, cb: int) -> bool:
    """True when :func:`bin_point_moments_pallas` has a legal VMEM-fitting
    auto bin batch at this shape (else callers use the XLA twin)."""
    return _auto_bin_batch(n_r, cq, cb) > 0


# ---------------------------------------------------------------------------
# Precomputation (tiny XLA ops; everything the kernels need as constants)
# ---------------------------------------------------------------------------


def prep_similarity(q: jnp.ndarray, t: jnp.ndarray, s: jnp.ndarray):
    """Fold the accumulated similarity into row-vector form.

    Returns (G (8, 8), b_row (1, 8)) such that for 8-D row points p:

        transform_points(p, q, t, s) == p @ G + b_row

    (geometry lanes get s*R(q) p + t; the homogeneous and photometric
    lanes pass through, G being identity there and b_row zero).
    """
    R = quat_to_matrix(q)
    A = jnp.eye(8, dtype=R.dtype)
    A = jax.lax.dynamic_update_slice(A, s * R, (0, 0))
    b_row = jnp.concatenate([t, jnp.zeros((5,), t.dtype)])[None, :]
    return A.T, b_row


def prep_rep_assign(reps: jnp.ndarray, alpha, G: jnp.ndarray,
                    b_row: jnp.ndarray):
    """Fold transform + metric + centering into the rep-assignment matmul.

    With ctr = mean(reps), b_c = reps - ctr, w8 the metric weights and
    tp = p @ G + b_row, the blended distance satisfies (up to a
    per-query constant, irrelevant to the argmin over representatives)::

        |tp - r|^2_w  ~  srow[r] - 2 * (p @ C)[r]

    where C = G @ (w8 * b_c)^T and srow = |b_c|^2_w - 2 (b_row - ctr)
    @ (w8 * b_c)^T. Centering both sides on ctr keeps the f32
    cancellation error of the quadratic expansion at offset scale — the
    same trick ops.distance.pairwise_sq_dists plays.

    Returns (C (8, n_r), srow (1, n_r)).
    """
    from icp_tpu.ops.distance import metric_weights

    w8 = metric_weights(alpha, reps.dtype)
    ctr = jnp.mean(reps, axis=0)
    b_c = reps - ctr
    B = (b_c * w8).T  # (8, n_r)
    srow = (jnp.sum(b_c * w8 * b_c, axis=1)[None, :]
            - 2.0 * jnp.dot(b_row - ctr[None, :], B, precision=_HI))
    C = jnp.dot(G, B, precision=_HI)
    return C, srow


# ---------------------------------------------------------------------------
# Kernel 1: transform + nearest representative
# ---------------------------------------------------------------------------


def _rep_assign_kernel(p_ref, c_ref, srow_ref, out_ref):
    """One grid step: BM queries' transformed rep scores + argmin, in VMEM.

    p_ref: (BM, 8) raw moving rows; c_ref: (8, n_r); srow_ref: (1, n_r);
    out_ref: (1, BM) int32 nearest-representative ids.
    """
    scores = srow_ref[:] - 2.0 * dot3(p_ref[:], c_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      in_kernel=True)
    # min + iota-select instead of jnp.argmin: Mosaic fails to legalize a
    # 2-D argmin whose reduced axis is a single lane tile (n_r <= 128,
    # the pyramid's coarse levels) — "unresolved materialization from
    # vector<8x128xf32> to vector<8x128xi32>". Same first-min-index
    # semantics: ties pick the smallest representative id.
    mn = jnp.min(scores, axis=1, keepdims=True)
    ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    n_r = scores.shape[1]
    out_ref[:] = jnp.min(jnp.where(scores <= mn, ids, n_r),
                         axis=1).astype(jnp.int32)[None, :]


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def rep_assign_pallas(moving8: jnp.ndarray, C: jnp.ndarray,
                      srow: jnp.ndarray, *, block_m: int = 0,
                      interpret: bool = False) -> jnp.ndarray:
    """Fused transform + query->representative argmin.

    Args:
      moving8: (m, 8) RAW moving landmarks (transform is folded into C).
      C, srow: from :func:`prep_rep_assign`.
      block_m: queries per grid step (0 = VMEM-aware auto).
    Returns:
      (m,) int32 nearest-representative id per query.
    """
    m, d = moving8.shape
    n_r = C.shape[1]
    if block_m == 0:
        block_m = _auto_block_m(m, n_r)
    block_m = min(block_m, m)
    assert m % block_m == 0, (m, block_m)
    grid = (m // block_m,)

    rid = pl.pallas_call(
        _rep_assign_kernel,
        compiler_params=_kernel_compiler_params(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        # Output rides as columns of a (1, m) row: a (1, block_m) block of
        # an (m/bm, block_m) array violates Mosaic's sublane tiling (the
        # second-to-last block dim must divide 8 or equal the array dim).
        out_specs=pl.BlockSpec((1, block_m), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_r * d,
            bytes_accessed=4 * (m * d + d * n_r + m),
            transcendentals=0,
        ),
        interpret=interpret,
    )(moving8, C, srow)
    return rid.reshape(m)


def rep_assign_ref(moving8: jnp.ndarray, C: jnp.ndarray,
                   srow: jnp.ndarray) -> jnp.ndarray:
    """Plain-XLA twin of :func:`rep_assign_pallas` (CPU path / golden)."""
    scores = srow - 2.0 * dot3(moving8, C, (((1,), (0,)), ((), ())))
    return jnp.argmin(scores, axis=1).astype(jnp.int32)


def _rep_assign_counts_kernel(p_ref, c_ref, srow_ref, out_ref, counts_ref):
    """:func:`_rep_assign_kernel` + per-bin count accumulation.

    The grouping needs per-bin counts; computed in XLA (searchsorted over
    the sorted ids) they cost ~22 us/iteration at the flagship shape.
    Here the one-hot winner selector falls out of the scores already in
    VMEM, and counts accumulate across the SEQUENTIAL grid in the (1, n_r)
    output block (constant index map) — the counts are free.
    """
    scores = srow_ref[:] - 2.0 * dot3(p_ref[:], c_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      in_kernel=True)
    n_r = scores.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    # keepdims min + first-min-index select (see _rep_assign_kernel for why
    # not argmin); the (BM, 1) winner broadcasts against the lane iota for
    # the exact one-hot without any relayout.
    mn = jnp.min(scores, axis=1, keepdims=True)
    sel = jnp.min(jnp.where(scores <= mn, ids, n_r), axis=1, keepdims=True)
    out_ref[:] = sel[:, 0].astype(jnp.int32)[None, :]

    blk = jnp.sum((ids == sel).astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    counts_ref[:] += blk


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def rep_assign_counts_pallas(moving8: jnp.ndarray, C: jnp.ndarray,
                             srow: jnp.ndarray, *, block_m: int = 0,
                             interpret: bool = False):
    """Fused transform + rep argmin + per-bin counts.

    Same contract as :func:`rep_assign_pallas` plus a second output:
    counts (n_r,) int32 with ``counts[b] == sum(rid == b)`` EXACTLY (the
    one-hot is derived from the same first-min select as rid). Feed the
    counts to grouping.group_rows_by_bin to skip its searchsorted.
    """
    m, d = moving8.shape
    n_r = C.shape[1]
    if block_m == 0:
        block_m = _auto_block_m(m, n_r)
    block_m = min(block_m, m)
    assert m % block_m == 0, (m, block_m)
    grid = (m // block_m,)

    rid, counts = pl.pallas_call(
        _rep_assign_counts_kernel,
        compiler_params=_kernel_compiler_params(),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_m, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, n_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, n_r), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_r * d + m * n_r,
            bytes_accessed=4 * (m * d + d * n_r + m + n_r),
            transcendentals=0,
        ),
        interpret=interpret,
    )(moving8, C, srow)
    return rid.reshape(m), counts.reshape(n_r)


def rep_assign_counts_ref(moving8: jnp.ndarray, C: jnp.ndarray,
                          srow: jnp.ndarray):
    """Plain-XLA twin of :func:`rep_assign_counts_pallas`."""
    rid = rep_assign_ref(moving8, C, srow)
    n_r = C.shape[1]
    counts = jnp.sum(
        (rid[None, :] == jnp.arange(n_r, dtype=jnp.int32)[:, None])
        .astype(jnp.int32), axis=1)
    return rid, counts


# ---------------------------------------------------------------------------
# Kernel 2: per-bin search reduced to 8x8 moment matrices
# ---------------------------------------------------------------------------


def _lane_iota(shape, dim):
    return jax.lax.broadcasted_iota(jnp.int32, shape, dim)


def _shift_0to3_into_4to7(dtype):
    """(8, 8) constant: rows 0:3 land on columns 4:7 (zero elsewhere)."""
    r = _lane_iota((8, 8), 0)
    c = _lane_iota((8, 8), 1)
    return jnp.logical_and(c == r + 4, r < 3).astype(dtype)


def _score_core(p, qvalid, reps_blk, bins_c, sq_b, G, b_row, alpha,
                in_kernel: bool = False):
    """Transform + per-bin rep centering + MXU bin scores + validity.

    Shapes: p (BB, cq, 8) RAW rows, qvalid (BB, cq), reps_blk (BB, 8),
    bins_c (BB, cb, 8) rep-centered bin points, sq_b (BB, cb) masked
    |b|^2 (+inf invalid), G (8, 8), b_row (1, 8).
    Returns (qc (BB, cq, 8) transformed rep-centered queries,
    scores (BB, cq, cb), sq_q (BB, cq), valid (BB, cq) f32 mask).
    """
    lane = _lane_iota((1, 1, 8), 2)
    # qc = (p @ G + b_row) - rep  (homogeneous lanes become exactly 0).
    off = b_row - reps_blk  # (BB, 8)
    tp = jax.lax.dot_general(p, G, (((2,), (0,)), ((), ())), precision=_HI)
    qc = tp + off[:, None, :]

    wvec = jnp.where(lane < 3, 1.0,
                     jnp.where(jnp.logical_and(lane >= 4, lane < 7),
                               alpha, 0.0)).astype(p.dtype)
    qg_w = qc * wvec
    sq_q = jnp.sum(qg_w * qc, axis=-1)  # (BB, cq)

    # Bin scores on the MXU; +inf rides in sq_b for invalid slots.
    cross = dot3(qg_w, bins_c, (((2,), (2,)), ((0,), (0,))),
                 in_kernel=in_kernel)
    scores = sq_b[:, None, :] - 2.0 * cross

    # Validity: slot occupied AND original point non-zero (the reference
    # defers the invalid-point discard downstream of its samplers,
    # kernels/icp_kernels.cl:50-51 — this is that discard) AND bin
    # non-empty (checked on the min score downstream: all-inf scores).
    mask03 = (lane < 3).astype(p.dtype)
    vo = (jnp.sum(jnp.abs(p) * mask03, axis=-1) > 0).astype(p.dtype)
    return qc, scores, sq_q, qvalid * vo


def _search_core(p, qvalid, reps_blk, bins_c, sq_b, G, b_row, alpha,
                 weighted: bool, robust: str, delta,
                 in_kernel: bool = False):
    """Shared in-VMEM search front of the fused kernels.

    :func:`_score_core` + argmin, one-hot winner selector, and the
    composed residual weight (reference icpComputeReduceWeights x
    optional robust IRLS factor).

    Returns (qc (BB, cq, 8) transformed rep-centered queries,
    one_hot (BB, cq, cb), w (BB, cq) validity-folded weights).
    """
    qc, scores, sq_q, valid0 = _score_core(p, qvalid, reps_blk, bins_c,
                                           sq_b, G, b_row, alpha,
                                           in_kernel=in_kernel)
    best_slot = jnp.argmin(scores, axis=-1)  # (BB, cq)
    best_score = jnp.min(scores, axis=-1)

    cb = bins_c.shape[1]
    slot_ids = _lane_iota(best_slot.shape + (cb,), 2)
    one_hot = (slot_ids == best_slot[..., None]).astype(p.dtype)

    valid = valid0 * jnp.isfinite(best_score).astype(p.dtype)
    w = valid
    if weighted or robust != "none":
        # +inf on empty bins flows through every factor below as a clean 0
        # (valid already zeroes those slots anyway).
        d2 = jnp.maximum(best_score + sq_q, 0.0)
    if weighted:
        w = w * (100.0 / (100.0 + d2))  # reference icpComputeReduceWeights
    if robust != "none":
        w = w * robust_factor(d2, robust, delta)
    return qc, one_hot, w


def _moment_math(p, qvalid, reps_blk, bins_c, sq_b, G, b_row, alpha,
                 weighted: bool, robust: str = "none", delta=None,
                 in_kernel: bool = False):
    """Shared kernel/ref body. Shapes: p (BB, cq, 8), qvalid (BB, cq),
    reps_blk (BB, 8), bins_c (BB, cb, 8), sq_b (BB, cb), G (8, 8),
    b_row (1, 8), alpha scalar; robust/delta select and scale the optional
    IRLS M-estimator factor (ops.moments.robust_factor). Returns P
    (BB, 8, 8)."""
    lane = _lane_iota((1, 1, 8), 2)
    qc, one_hot, w = _search_core(p, qvalid, reps_blk, bins_c, sq_b, G,
                                  b_row, alpha, weighted, robust, delta,
                                  in_kernel=in_kernel)
    # Winner's centered point, straight into u's lanes 4:7: fold the lane
    # shift into a second tiny matmul (no in-VMEM concat/roll needed).
    matched_shift = jax.lax.dot_general(
        jax.lax.dot_general(one_hot, bins_c,
                            (((2,), (1,)), ((0,), (0,))), precision=_HI),
        _shift_0to3_into_4to7(p.dtype),
        (((2,), (0,)), ((), ())), precision=_HI)

    mask03 = (lane < 3).astype(p.dtype)
    ones37 = jnp.logical_or(lane == 3, lane == 7).astype(p.dtype)
    u = qc * mask03 + matched_shift + ones37
    # The entire statistical tail of the reference pipeline (weights sum,
    # icpMean[_Weighted], icpSubtractMean, icpSijProducts) as ONE batched
    # MXU product: P = sum_i w_i u_i u_i^T.
    return jax.lax.dot_general(u * w[..., None], u,
                               (((1,), (1,)), ((0,), (0,))), precision=_HI)


def _make_moment_kernel(weighted: bool, robust: str):
    def kernel(p_ref, qvalid_ref, reps_ref, bins_ref, sq_b_ref, g_ref,
               b_ref, scal_ref, out_ref):
        out_ref[:] = _moment_math(
            p_ref[:], qvalid_ref[:], reps_ref[:], bins_ref[:], sq_b_ref[:],
            g_ref[:], b_ref[:], scal_ref[0, 0], weighted, robust,
            scal_ref[0, 1], in_kernel=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("weighted", "robust",
                                             "bin_batch", "interpret",
                                             "vmem_limit_bytes"))
def bin_point_moments_pallas(mg: jnp.ndarray, qvalid: jnp.ndarray,
                             reps: jnp.ndarray, bins_c: jnp.ndarray,
                             sq_b_masked: jnp.ndarray, G: jnp.ndarray,
                             b_row: jnp.ndarray, alpha, *, weighted: bool,
                             robust: str = "none", robust_delta=0.0,
                             bin_batch: int = 0, vmem_limit_bytes: int = 0,
                             interpret: bool = False) -> jnp.ndarray:
    """Fused per-bin search + weighting + 8x8 moment reduction.

    Args:
      mg: (n_r, cq, 8) bin-grouped RAW moving rows (transform in-kernel).
      qvalid: (n_r, cq) f32 slot validity from the grouping.
      reps: (n_r, 8) representatives (per-bin centering).
      bins_c: (n_r, cb, 8) rep-centered bin points (RBCIndex.bins_centered).
      sq_b_masked: (n_r, cb) masked |b|^2 (+inf on invalid slots).
      G, b_row: from :func:`prep_similarity`.
      alpha: photometric blend (traced scalar).
      weighted: reference WEIGHTED vs REGULAR residual weighting.
      robust: static robust-kernel name ("none"/"huber"/"tukey"/"trimmed");
        its IRLS factor multiplies into w in-kernel.
      robust_delta: traced robust scale (blended distance units).
      bin_batch: bins per grid step (0 = VMEM-aware auto).
    Returns:
      (n_r, 8, 8) per-bin weighted second-moment matrices P_b in the
      rep-centered frame (see module docstring for the lane layout).
    """
    n_r, cq, d = mg.shape
    cb = bins_c.shape[1]
    if bin_batch == 0:
        bin_batch = _auto_bin_batch(n_r, cq, cb)
        if bin_batch == 0:
            raise ValueError(
                f"no legal VMEM-fitting bin batch at n_r={n_r}, cq={cq}, "
                f"cb={cb}; gate on moments_kernel_fits() and use "
                "bin_point_moments_ref instead")
    bin_batch = min(bin_batch, n_r)
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    grid = (n_r // bin_batch,)
    scal_arr = jnp.stack([jnp.asarray(alpha, mg.dtype),
                          jnp.asarray(robust_delta, mg.dtype)]).reshape(1, 2)

    def i3(i):
        return (i, 0, 0)

    def i2(i):
        return (i, 0)

    def full2(i):
        return (0, 0)

    return pl.pallas_call(
        _make_moment_kernel(weighted, robust),
        compiler_params=_kernel_compiler_params(vmem_limit_bytes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bin_batch, cq, d), i3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cq), i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, d), i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, d), i3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb), i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bin_batch, d, d), i3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, d, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_r * cq * cb * d * 2 + 2 * n_r * cq * d * d * 3,
            bytes_accessed=4 * n_r * (cq * d + cb * d + cb + cq + d * d),
            # Huber's IRLS factor is the only transcendental (one rsqrt
            # per query slot); the other kernels are polynomial.
            transcendentals=n_r * cq if robust == "huber" else 0,
        ),
        interpret=interpret,
    )(mg, qvalid, reps, bins_c, sq_b_masked, G, b_row, scal_arr)


def bin_point_moments_ref(mg: jnp.ndarray, qvalid: jnp.ndarray,
                          reps: jnp.ndarray, bins_c: jnp.ndarray,
                          sq_b_masked: jnp.ndarray, G: jnp.ndarray,
                          b_row: jnp.ndarray, alpha, *, weighted: bool,
                          robust: str = "none", robust_delta=0.0
                          ) -> jnp.ndarray:
    """Plain-XLA twin of :func:`bin_point_moments_pallas` — the production
    path on CPU backends and the interpret-parity golden."""
    alpha = jnp.asarray(alpha, mg.dtype)
    return _moment_math(mg, qvalid, reps, bins_c, sq_b_masked, G, b_row,
                        alpha, weighted, robust,
                        jnp.asarray(robust_delta, mg.dtype))


# ---------------------------------------------------------------------------
# Kernel 2b: per-bin nearest-neighbor distances only (adaptive robust scale)
# ---------------------------------------------------------------------------


def _min_dist_math(p, qvalid, reps_blk, bins_c, sq_b, G, b_row, alpha,
                   in_kernel: bool = False):
    """Shared kernel/ref body: blended squared NN distance per query slot,
    +inf on invalid slots (unoccupied, zero-geometry original, empty bin).
    No argmin, no one-hot, no matched gather — just the score matmul and
    a min, so this pass costs roughly half the moment kernel."""
    _qc, scores, sq_q, valid0 = _score_core(p, qvalid, reps_blk, bins_c,
                                            sq_b, G, b_row, alpha,
                                            in_kernel=in_kernel)
    best_score = jnp.min(scores, axis=-1)
    d2 = jnp.maximum(best_score + sq_q, 0.0)
    return jnp.where(jnp.logical_and(valid0 > 0,
                                     jnp.isfinite(best_score)),
                     d2, jnp.inf)


def _make_min_dist_kernel():
    def kernel(p_ref, qvalid_ref, reps_ref, bins_ref, sq_b_ref, g_ref,
               b_ref, scal_ref, out_ref):
        out_ref[:] = _min_dist_math(
            p_ref[:], qvalid_ref[:], reps_ref[:], bins_ref[:], sq_b_ref[:],
            g_ref[:], b_ref[:], scal_ref[0, 0], in_kernel=True)

    return kernel


@functools.partial(jax.jit, static_argnames=("bin_batch", "interpret",
                                             "vmem_limit_bytes"))
def bin_min_dists_pallas(mg: jnp.ndarray, qvalid: jnp.ndarray,
                         reps: jnp.ndarray, bins_c: jnp.ndarray,
                         sq_b_masked: jnp.ndarray, G: jnp.ndarray,
                         b_row: jnp.ndarray, alpha, *, bin_batch: int = 0,
                         vmem_limit_bytes: int = 0,
                         interpret: bool = False) -> jnp.ndarray:
    """Fused per-bin search distances — the adaptive-robust first pass.

    The adaptive M-estimator scale needs the per-pair residual median
    BEFORE the moment kernel can weight pairs, and the moment kernels
    never materialize d2 — this kernel computes ONLY d2 (score matmul +
    min; no argmin / one-hot / matched gather / moment contractions), so
    robust_adaptive configs ride the same two-pass fused pipeline as
    everything else instead of the grouped-search path. Arguments mirror
    :func:`bin_point_moments_pallas`; returns (n_r, cq) blended squared
    NN distances, +inf on invalid slots (feed
    ops.moments.adaptive_robust_delta with mask = isfinite).
    """
    n_r, cq, d = mg.shape
    cb = bins_c.shape[1]
    if bin_batch == 0:
        bin_batch = _auto_bin_batch(n_r, cq, cb)
        if bin_batch == 0:
            raise ValueError(
                f"no legal VMEM-fitting bin batch at n_r={n_r}, cq={cq}, "
                f"cb={cb}; gate on moments_kernel_fits() and use "
                "bin_min_dists_ref instead")
    bin_batch = min(bin_batch, n_r)
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    grid = (n_r // bin_batch,)
    scal_arr = jnp.asarray(alpha, mg.dtype).reshape(1, 1)

    def i3(i):
        return (i, 0, 0)

    def i2(i):
        return (i, 0)

    def full2(i):
        return (0, 0)

    return pl.pallas_call(
        _make_min_dist_kernel(),
        compiler_params=_kernel_compiler_params(vmem_limit_bytes),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bin_batch, cq, d), i3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cq), i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, d), i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb, d), i3, memory_space=pltpu.VMEM),
            pl.BlockSpec((bin_batch, cb), i2, memory_space=pltpu.VMEM),
            pl.BlockSpec((d, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), full2, memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((bin_batch, cq), i2,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, cq), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_r * cq * cb * d * 2,
            bytes_accessed=4 * n_r * (cq * d + cb * d + cb + 2 * cq),
            transcendentals=0,
        ),
        interpret=interpret,
    )(mg, qvalid, reps, bins_c, sq_b_masked, G, b_row, scal_arr)


def bin_min_dists_ref(mg: jnp.ndarray, qvalid: jnp.ndarray,
                      reps: jnp.ndarray, bins_c: jnp.ndarray,
                      sq_b_masked: jnp.ndarray, G: jnp.ndarray,
                      b_row: jnp.ndarray, alpha) -> jnp.ndarray:
    """Plain-XLA twin of :func:`bin_min_dists_pallas`."""
    return _min_dist_math(mg, qvalid, reps, bins_c, sq_b_masked, G, b_row,
                          jnp.asarray(alpha, mg.dtype))


# ---------------------------------------------------------------------------
# Assembly: per-bin P matrices -> global Horn inputs
# ---------------------------------------------------------------------------


def point_moment_partials(P: jnp.ndarray, reps: jnp.ndarray,
                          W_t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Translate per-bin rep-centered moments to common-frame global sums.

    Exact algebra over n_r rows (for each bin with rep r, weights w and
    m/f the TRANSFORMED-moving / matched-fixed points)::

        sum w m f^T |_bin = smf + sm r^T + r sf^T + s0 r r^T

    Args:
      P: (n_b, 8, 8) from the moment kernel.
      reps: (n_b, 8) the bins' representatives.
      W_t: optional (n_b, 8, 8, 18) hoisted translation tensor
        (:func:`point_translation_tensor`). The translation is LINEAR in P
        with coefficients depending only on the loop-invariant reps, so
        with W_t the whole tail is ONE (1, n_b*64) x (n_b*64, 18) matmul.
        The direct form below is ~20 tiny slice/outer/sum kernels: timed
        in isolation they cost ~0.1 ms (profile_fused_stages.py), but XLA
        overlaps most of that inside the real loop — the interleaved
        full-loop A/B (benchmarks/profile_translation_ab.py, v5e) shows
        ~2% per iteration (0.370 vs 0.377 ms), plus a smaller launch
        graph (fewer tiny kernels = less slow-window drift surface).
    Returns:
      (18,) vector [W, Sm(3), Sf(3), Smf(9), Sff, Smm] of PRE-mean-
      subtraction sums — additive across disjoint bin sets, so shards
      ``psum`` this vector (the entire per-iteration POINT collective
      payload) before :func:`assemble_point_moments`.
    """
    if W_t is not None:
        n_b = P.shape[0]
        return jax.lax.dot_general(
            P.reshape(1, n_b * 64), W_t.reshape(n_b * 64, 18),
            (((1,), (0,)), ((), ())), precision=_HI).reshape(18)
    r = reps[:, :3]
    s0 = P[:, 3, 3]
    sm = P[:, 0:3, 3]
    sf = P[:, 3, 4:7]
    smf = P[:, 0:3, 4:7]
    smm = P[:, 0, 0] + P[:, 1, 1] + P[:, 2, 2]
    sff = P[:, 4, 4] + P[:, 5, 5] + P[:, 6, 6]

    W = jnp.sum(s0)
    Sm = jnp.sum(sm + s0[:, None] * r, axis=0)
    Sf = jnp.sum(sf + s0[:, None] * r, axis=0)
    Smf = jnp.sum(
        smf
        + sm[:, :, None] * r[:, None, :]
        + r[:, :, None] * sf[:, None, :]
        + s0[:, None, None] * (r[:, :, None] * r[:, None, :]),
        axis=0,
    )
    r2 = jnp.sum(r * r, axis=1)
    Sff = jnp.sum(sff + 2.0 * jnp.sum(sf * r, axis=1) + s0 * r2)
    Smm = jnp.sum(smm + 2.0 * jnp.sum(sm * r, axis=1) + s0 * r2)
    return jnp.concatenate([
        jnp.stack([W]), Sm, Sf, Smf.reshape(9), jnp.stack([Sff, Smm])])


def point_translation_tensor(reps: jnp.ndarray) -> jnp.ndarray:
    """Hoisted coefficients of the per-bin moment translation.

    :func:`point_moment_partials` is linear in P (every term carries
    exactly one P factor) with coefficients built from the bins'
    representatives — which are LOOP-INVARIANT. This returns the
    (n_b, 8, 8, 18) tensor W_t with ``sums[k] = sum_{b,i,j} P[b,i,j] *
    W_t[b,i,j,k]``, computed ONCE at index-build time, turning the
    per-iteration tail into a single MXU matvec.

    Built with ``jacrev`` of the direct algebra, so the two forms cannot
    drift apart. Leading axis is n_b so mp shards slice it like the other
    per-bin index fields (parallel.sharded._slice_index_for_mp).
    """
    jac = jax.jacrev(lambda P: point_moment_partials(P, reps))(
        jnp.zeros((reps.shape[0], 8, 8), reps.dtype))  # (18, n_b, 8, 8)
    return jnp.transpose(jac, (1, 2, 3, 0))


def assemble_point_moments(sums: jnp.ndarray, c):
    """Global Horn inputs from the (18,) moment sums.

    Subtracts the rank-one mean term, matching ops.moments.centroids +
    deviations + s_matrix (the reference's icpMean_Weighted /
    icpSubtractMean / icpSijProducts chain, kernels/icp_kernels.cl:454-
    743). The c scaling is applied at the end (reference
    kernels/icp_kernels.cl:609-613; it cancels in s_k).

    Returns:
      (S11 (11,) in icpSijProducts layout, mean_f (3,), mean_m (3,),
       sum_w scalar).
    """
    W = sums[0]
    Sm = sums[1:4]
    Sf = sums[4:7]
    Smf = sums[7:16].reshape(3, 3)
    Sff = sums[16]
    Smm = sums[17]

    # Fully-masked-frame guard: 0/0 here would poison the state (the solve
    # side is guarded in horn.solve_step_transform).
    safe_w = jnp.where(W > 0, W, 1.0)
    mean_m = Sm / safe_w
    mean_f = Sf / safe_w
    S3 = Smf - jnp.outer(Sm, Sf) / safe_w
    ff = Sff - jnp.sum(Sf * Sf) / safe_w
    mm = Smm - jnp.sum(Sm * Sm) / safe_w

    c2 = jnp.asarray(c, S3.dtype) ** 2
    S11 = jnp.concatenate([S3.reshape(9), jnp.stack([ff, mm])]) * c2
    return S11, mean_f, mean_m, W


def point_moments_from_P(P: jnp.ndarray, reps: jnp.ndarray, c,
                         W_t: jnp.ndarray | None = None):
    """Single-device composition: per-bin P matrices -> Horn inputs."""
    return assemble_point_moments(point_moment_partials(P, reps, W_t), c)
