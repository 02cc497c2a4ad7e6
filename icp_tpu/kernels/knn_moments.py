"""Pallas TPU kernel: per-bin kNN covariance moments for normal estimation.

The unfused per-bin pass of :func:`icp_tpu.ops.normals.knn_normals_rbc`
(XLA einsums + ``top_k``) costs 76 ms at 262144 points on a v5e, ~57 ms of
it in ``top_k(k)`` over the candidate axis (sorting-network lowering) and
most of the rest in HBM round-trips of the (cq, cb) distance tensor. Here
one kernel keeps d2 VMEM-resident and replaces the top-k with a bisection
on the k-th distance VALUE (count-below threshold, T static halvings —
pure VPU compares over the resident tile), then builds each query's
neighborhood covariance with two masked MXU matmuls:

    S1 = W @ bins          (BB, cq, 3)
    M2 = W @ b9            (BB, cq, 9), b9 = slotwise outer products
    C  = M2 - S1 S1^T / n  (n = |W| — ties/unresolved bisection may pick
                            a few more than k; PCA is insensitive)

No neighbor index is ever materialized and nothing per-candidate returns
to HBM. The reference counterpart is brute kNN host-side (it has no
normal estimation; this serves the beyond-reference PLANE/GICP objectives
on unorganized clouds — SURVEY.md §2.5 RBC rationale).

The XLA twin (:func:`bin_knn_moments_ref`) shares the SAME math (same
bisection) so CPU backends and interpret-mode parity tests see identical
semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.fused_step import _kernel_compiler_params, dot3

_HI = jax.lax.Precision.HIGHEST

# Bisection halvings for the k-th distance value: 18 resolves the
# threshold to ~2^-18 of the neighborhood's distance range — below the
# spacing of distinct neighbors on mm-scale clouds (ties just admit the
# tied member, which PCA does not feel).
_BISECT_ITERS = 18

# Against the 64 MB Mosaic limit: the analytic per-bin model below
# underestimates the compiler's stack copies by ~1.75x (measured: model
# 39.9 MB -> actual 70.1 MB at cq=256, cb=512), so the budget leaves that
# headroom.
_VMEM_BUDGET = 24 * 1024 * 1024


def _knn_math(qp, bins, reps, bvalid, k: int, in_kernel: bool = False):
    """Shared kernel/twin body.

    Shapes: qp (BB, cq, 3) RAW grouped queries (NaN for invalid points),
    bins (BB, cb, 3) RAW candidates (NaN for invalid points), reps
    (BB, 3) bin representatives, bvalid (BB, cb) slot-occupancy mask.
    Everything is centered by the bin's representative IN here:
    covariances/distances are translation-invariant, raw world
    coordinates (z ~ 1.5e3) would eat f32 in the C = M2 - S1 S1^T / n
    cancellation, and centering outside the kernel materializes two
    ~0.5 GB lane-padded HBM intermediates at the 16x shape (measured
    ~10 ms of fusions in the profiler trace). The slotwise outer
    products b9 are likewise built in here (one-hot lane expansions —
    reshape-free for Mosaic).
    Returns ((c00, c01, c02, c11, c12, c22), cnt).
    """
    qp = qp - reps[:, None, :]
    bins = bins - reps[:, None, :]
    sq_b = jnp.sum(bins * bins, axis=-1)
    sq_b = jnp.where(bvalid & jnp.isfinite(sq_b), sq_b, jnp.inf)
    # Zero the invalid (NaN-encoded) candidate entries: their sq_b is
    # +inf (excluded from every neighborhood via d2), but a NaN entry
    # would poison the W-masked matmuls below (0 * NaN = NaN). Elementwise
    # full-shape mask — Mosaic rejects minor-dim insertion on i1 vectors.
    bins = jnp.where(jnp.isfinite(bins), bins, 0.0)
    r = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (3, 9), 1)
    e_div = (r == c // 3).astype(qp.dtype)
    e_mod = (r == c % 3).astype(qp.dtype)
    dims9 = (((2,), (0,)), ((), ()))
    b9 = (jax.lax.dot_general(bins, e_div, dims9, precision=_HI)
          * jax.lax.dot_general(bins, e_mod, dims9, precision=_HI))
    sq_q = jnp.sum(qp * qp, axis=-1)  # (BB, cq)
    cross = dot3(qp, bins, (((2,), (2,)), ((0,), (0,))), in_kernel=in_kernel)
    d2 = sq_q[..., None] - 2.0 * cross + sq_b[:, None, :]  # (BB, cq, cb)
    finite = jnp.isfinite(d2)
    n_valid = jnp.sum(finite.astype(qp.dtype), axis=-1)  # (BB, cq)
    k_eff = jnp.minimum(jnp.asarray(float(k), qp.dtype), n_valid)

    # Bisection on the k-th smallest value. Invariant: count(<= hi) >=
    # k_eff (hi starts above the max finite value), count(<= lo) < k_eff.
    hi = jnp.max(jnp.where(finite, d2, 0.0), axis=-1) + 1.0
    lo = jnp.zeros_like(hi) - 1.0
    for _ in range(_BISECT_ITERS):
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum((d2 <= mid[..., None]).astype(qp.dtype), axis=-1)
        take_hi = cnt >= k_eff
        hi = jnp.where(take_hi, mid, hi)
        lo = jnp.where(take_hi, lo, mid)

    W = jnp.logical_and(d2 <= hi[..., None], finite).astype(qp.dtype)
    cnt = jnp.maximum(jnp.sum(W, axis=-1), 1.0)
    # dot3, not HIGHEST, and it is EXACT here: W is 0/1 (lossless in
    # bf16, lo part identically zero), so the 3-pass split reduces to
    # W @ b_hi + W @ b_lo = the exact f32 product at half HIGHEST's pass
    # count.
    dims_w = (((2,), (1,)), ((0,), (0,)))
    S1 = dot3(W, bins, dims_w, in_kernel=in_kernel)  # (BB, cq, 3)
    M2 = dot3(W, b9, dims_w, in_kernel=in_kernel)    # (BB, cq, 9)
    # outer(S1, S1) flattened to 9 lanes WITHOUT a (.., 3, 3) -> (.., 9)
    # reshape (Mosaic: "unsupported shape cast"): lane j of the flat outer
    # is S1[j // 3] * S1[j % 3], via the same one-hot expansions as b9.
    outer9 = (jax.lax.dot_general(S1, e_div, dims9, precision=_HI)
              * jax.lax.dot_general(S1, e_mod, dims9, precision=_HI))
    C = M2 - outer9 / cnt[..., None]
    # Unpack the 6 unique symmetric components as CLEAN 2-D (BB, cq)
    # arrays: anything shaped (.., 9) or (.., 3, 3) tiles its minor dim to
    # 128 lanes in HBM (a (n_r, cq, 9) tensor costs 268 MB at the 16x
    # shape and every downstream eig intermediate re-pays it — the
    # unpadded component form made the closed-form eig 29 ms -> sub-ms).
    return ((C[..., 0], C[..., 1], C[..., 2],
             C[..., 4], C[..., 5], C[..., 8]), cnt)


def _make_kernel(k: int):
    def kernel(qp_ref, bins_ref, reps_ref, bval_ref, c00_ref, c01_ref,
               c02_ref, c11_ref, c12_ref, c22_ref, cnt_ref):
        comps, cnt = _knn_math(qp_ref[:], bins_ref[:], reps_ref[:],
                               bval_ref[:] > 0.5, k, in_kernel=True)
        for ref, comp in zip((c00_ref, c01_ref, c02_ref,
                              c11_ref, c12_ref, c22_ref), comps):
            ref[:] = comp
        cnt_ref[:] = cnt
    return kernel


def _auto_bin_batch(n_r: int, cq: int, cb: int) -> int:
    """Bins per grid step under the VMEM budget (lane dims pad to 128,
    so every last-dim-<=128 tensor costs a full 128-lane tile)."""
    per_bin = 4 * (cq * 128      # qp
                   + 2 * cb * 128  # bins + in-kernel b9
                   + cb           # sq_b
                   + 3 * cq * cb  # d2 + W + compiler slack
                   + 2 * cq * 128)  # C out + cnt/scratch
    for bb in (32, 16, 8, 4, 2, 1):
        if n_r % bb == 0 and bb * per_bin <= _VMEM_BUDGET:
            return bb
    return 0


def knn_kernel_fits(n_r: int, cq: int, cb: int) -> bool:
    return _auto_bin_batch(n_r, cq, cb) > 0


@functools.partial(jax.jit, static_argnames=("k", "bin_batch", "interpret"))
def bin_knn_moments_pallas(qp: jnp.ndarray, bins: jnp.ndarray,
                           reps: jnp.ndarray, bvalid: jnp.ndarray, *,
                           k: int, bin_batch: int = 0,
                           interpret: bool = False):
    """((c00, c01, c02, c11, c12, c22) each (n_r, cq), cnt (n_r, cq)):
    per-query kNN covariance components (unique symmetric entries)."""
    n_r, cq, _ = qp.shape
    cb = bins.shape[1]
    if bin_batch == 0:
        bin_batch = _auto_bin_batch(n_r, cq, cb)
        assert bin_batch > 0, (n_r, cq, cb)
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    grid = (n_r // bin_batch,)
    bspec = lambda shape: pl.BlockSpec(  # noqa: E731
        (bin_batch,) + shape, lambda i: (i,) + (0,) * len(shape))
    flat = jax.ShapeDtypeStruct((n_r, cq), qp.dtype)
    outs = pl.pallas_call(
        _make_kernel(k),
        compiler_params=_kernel_compiler_params(),
        grid=grid,
        in_specs=[bspec((cq, 3)), bspec((cb, 3)), bspec((3,)),
                  bspec((cb,))],
        out_specs=[bspec((cq,))] * 7,
        out_shape=[flat] * 7,
        interpret=interpret,
    )(qp, bins, reps, bvalid.astype(qp.dtype))
    return tuple(outs[:6]), outs[6]


def _top2_counts_kernel(p_ref, c_ref, srow_ref, out1_ref, out2_ref,
                        counts_ref):
    """Top-2 nearest representatives + per-choice bin counts, with the
    (block_m, n_r) score strip VMEM-resident.

    The XLA strip formulation (matmul + two masked argmin passes)
    materializes the score strip in HBM and re-reads it per pass: ~9 ms
    at 262144x2048 on a v5e; here the strip never leaves VMEM. Counts
    accumulate across the sequential grid in the constant-index (2, n_r)
    block (the rep_assign_counts idiom, kernels/fused_step.py)."""
    scores = srow_ref[:] - 2.0 * dot3(p_ref[:], c_ref[:],
                                      (((1,), (0,)), ((), ())),
                                      in_kernel=True)
    n_r = scores.shape[1]
    ids = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mn = jnp.min(scores, axis=1, keepdims=True)
    sel1 = jnp.min(jnp.where(scores <= mn, ids, n_r), axis=1, keepdims=True)
    out1_ref[:] = sel1[:, 0].astype(jnp.int32)[None, :]
    c1 = jnp.sum((ids == sel1).astype(jnp.int32), axis=0, keepdims=True)
    # Mask the winner COLUMN (by id — exact) and take the second minimum.
    scores2 = jnp.where(ids == sel1, jnp.inf, scores)
    mn2 = jnp.min(scores2, axis=1, keepdims=True)
    sel2 = jnp.min(jnp.where(scores2 <= mn2, ids, n_r), axis=1,
                   keepdims=True)
    out2_ref[:] = sel2[:, 0].astype(jnp.int32)[None, :]
    c2 = jnp.sum((ids == sel2).astype(jnp.int32), axis=0, keepdims=True)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        counts_ref[:] = jnp.zeros_like(counts_ref)

    counts_ref[0:1] += c1
    counts_ref[1:2] += c2


@functools.partial(jax.jit, static_argnames=("block_m", "interpret"))
def rep_top2_counts_pallas(p3: jnp.ndarray, reps: jnp.ndarray, *,
                           block_m: int = 0, interpret: bool = False):
    """((m,) first-choice ids, (m,) second-choice ids, (2, n_r) counts)."""
    from icp_tpu.kernels.fused_step import _auto_block_m

    m, d = p3.shape
    n_r = reps.shape[0]
    if block_m == 0:
        block_m = _auto_block_m(m, n_r)
    block_m = min(block_m, m)
    assert m % block_m == 0, (m, block_m)
    c3 = reps.T  # (3, n_r)
    srow = jnp.sum(reps * reps, axis=-1)[None, :]  # (1, n_r)

    i1, i2, counts = pl.pallas_call(
        _top2_counts_kernel,
        compiler_params=_kernel_compiler_params(),
        grid=(m // block_m,),
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
            pl.BlockSpec((1, block_m), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_r), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((1, m), jnp.int32),
            jax.ShapeDtypeStruct((2, n_r), jnp.int32),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * n_r * d + 6 * m * n_r,
            bytes_accessed=4 * (m * d + d * n_r + 2 * m + 2 * n_r),
            transcendentals=0,
        ),
        interpret=interpret,
    )(p3, c3, srow)
    return i1.reshape(m), i2.reshape(m), counts


def bin_knn_moments_ref(qp: jnp.ndarray, bins: jnp.ndarray,
                        reps: jnp.ndarray, bvalid: jnp.ndarray, *,
                        k: int, chunk: int = 128):
    """XLA twin (identical math, chunked over bins to bound memory)."""
    n_r = qp.shape[0]
    n_chunks = max(n_r // chunk, 1)
    csz = n_r // n_chunks

    def body(args):
        return _knn_math(*args, k=k)

    comps, cnt = jax.lax.map(
        body, (qp.reshape(n_chunks, csz, *qp.shape[1:]),
               bins.reshape(n_chunks, csz, *bins.shape[1:]),
               reps.reshape(n_chunks, csz, *reps.shape[1:]),
               bvalid.reshape(n_chunks, csz, *bvalid.shape[1:])))
    cq = qp.shape[1]
    return (tuple(c.reshape(n_r, cq) for c in comps),
            cnt.reshape(n_r, cq))
