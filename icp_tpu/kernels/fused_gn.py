"""Pallas TPU kernels: fused Gauss-Newton hot loop (PLANE / GICP).

Extends the fused two-pass POINT pipeline (kernels/fused_step.py) to the
normal-consuming objectives. The grouped-search path these objectives used
materializes per-point tables (queries, matches, distances, normals — each
(n_r, cq, >=8) padded to 128 lanes in HBM) and then runs the GN row
reductions as separate XLA passes; measured 0.51 (PLANE) / 0.79 (GICP) vs
0.39 ms/iteration for fused POINT at the flagship shape. This kernel
collapses per-bin search + weighting + the ENTIRE GN system build into the
same (n_r, 8, 8) per-bin moment output.

The unifying algebra: every GN row of both objectives has the form

    v = [u, m x u, u . (m - f), 1]          (8 lanes)

for a direction u — the point-to-plane row with u = n (or the symmetric
n_f + R n_m), and the GICP row TRIPLE with u_k = rows of L^{-1} where
M = C_f + R C_m R^T = L L^T is the pair's 3x3 Mahalanobis denominator
(closed-form Cholesky; SPD by construction with eigenvalues in [2 eps, 2],
see icp.gicp.disk_covariance_sum). That works because

    J^T M^{-1} J = (L^{-1} J)^T (L^{-1} J),   row_k(L^{-1} J) = u_k^T J,
    u^T J = [u ; m x u]        (J = [I | -[m]_x], cross product linear in u)

so GICP's anisotropically-weighted system is EXACTLY three plane-style
rank-1 rows per pair — no per-pair eigendecomposition, no 3x3 solves.

The per-bin moment matrix P_b = sum_i w_i v_i v_i^T (m CENTERED on the
bin representative, m x u in raw mm) then carries the whole system:
translation to the global frame is the per-bin congruence V = sum_b
T_b P_b T_b^T with T_b = I + skew(rep_b) in the (3:6, 0:3) block — linear
in P, so it is hoisted into a (n_b, 8, 8, 64) coefficient tensor at index
build time exactly like the POINT translation (point_translation_tensor).
After unit balancing (1/L on the rotation rows/cols):

    H = V[0:6, 0:6],  b = V[0:6, 6],  sum w r^2 = V[6, 6],  3?sum w = V[7,7]

feed icp_tpu.icp.plane.solve_plane_system unchanged.

``*_ref`` twins implement identical math in plain XLA — the production
path on CPU backends and the interpret-mode parity goldens.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icp_tpu.kernels.fused_step import (
    _HI,
    _kernel_compiler_params,
    _lane_iota,
    _search_core,
    _STACK_BUDGET,
)

GN_MODES = ("plane", "plane_sym", "gicp")


# Measured Mosaic stack bytes per bin-slot-pair (cq x cb) for the DEFAULT
# "sublane" v layout, by mode (v5e anchors at cq=96, cb=128: plane bb=32
# = 17.80 MB actual -> 45.3 B/slot; gicp bb=16 = 21.41 MB -> 109 B/slot).
# Since round 3 raised the per-kernel Mosaic limit to KERNEL_VMEM_LIMIT
# (see fused_step), these anchors no longer FORCE small batches at
# production shapes — batch choice below is by MEASURED speed — but they
# still gate extreme-capacity shapes against _STACK_BUDGET so those fall
# back to the XLA twin. The "lane" layout is experimental-only (it
# allocates ~2x MORE stack than sublane despite its smaller logical
# footprint — 37.5 MB at plane bb=16; see _gn_math's v_layout docstring).
_GN_BYTES_PER_SLOT = {"plane": 50, "plane_sym": 60, "gicp": 118}

# Full-dim blocks above this are never worth it (grid pipelining dies).
_GN_MAX_FULL_DIM = 32


def _auto_bin_batch_gn(n_r: int, cq: int, cb: int, mode: str) -> int:
    """MEASURED-fastest legal bin batch for the GN kernel.

    Preference comes from the round-3 same-process FULL-REGISTRATION A/B
    at the flagship shape (isolated-kernel rankings invert when composed;
    see fused_step._auto_bin_batch): plane bb=32 0.367 ms/iteration vs
    bb=16 0.385 — bb=32 (17.8 MB stack) is exactly the shape the old
    16 MB default Mosaic limit rejected, and is the raised
    KERNEL_VMEM_LIMIT's production win; gicp bb=8 0.683 vs bb=16 0.699.
    The byte-per-slot stack model gates extreme shapes to the XLA twin
    (same rule as fused_step._auto_bin_batch)."""
    out_bytes = n_r * 8 * 128 * 4
    budget = _STACK_BUDGET - out_bytes
    per_bin = _GN_BYTES_PER_SLOT[mode] * cq * cb
    if n_r <= _GN_MAX_FULL_DIM and n_r * per_bin <= budget:
        return n_r
    candidates = (8, 16, 32) if mode == "gicp" else (32, 16, 8)
    for bb in candidates:
        if bb <= n_r and n_r % bb == 0 and bb * per_bin <= budget:
            return bb
    return 0


def gn_kernel_fits(n_r: int, cq: int, cb: int, mode: str) -> bool:
    """True when :func:`bin_gn_moments_pallas` has a legal VMEM-fitting
    auto bin batch at this shape (else callers use the XLA twin)."""
    return _auto_bin_batch_gn(n_r, cq, cb, mode) > 0


def _chol3_inv_rows(m11, m21, m22, m31, m32, m33):
    """Rows of L^{-1} for the SPD 3x3 M = L L^T, all closed form.

    Inputs/outputs are (BB, cq) scalar planes. M's eigenvalues lie in
    [2 eps, 2] (disk covariances of unit normals), so every pivot is
    >= 2 eps and the three rsqrt/divides are f32-safe.
    """
    l11 = jnp.sqrt(m11)
    i11 = 1.0 / l11
    l21 = m21 * i11
    l31 = m31 * i11
    l22 = jnp.sqrt(m22 - l21 * l21)
    i22 = 1.0 / l22
    l32 = (m32 - l31 * l21) * i22
    l33 = jnp.sqrt(jnp.maximum(m33 - l31 * l31 - l32 * l32, 1e-12))
    i33 = 1.0 / l33
    u1 = (i11, None, None)
    u2 = (-l21 * i11 * i22, i22, None)
    u3 = ((l21 * l32 - l31 * l22) * (i11 * i22 * i33),
          -l32 * i22 * i33, i33)
    return u1, u2, u3


def _gn_math(p, nm, qvalid, reps_blk, bins_vals, sq_b, G, b_row, alpha,
             mode: str, weighted: bool, robust: str = "none", delta=None,
             gicp_eps=None, v_layout: str = "sublane",
             in_kernel: bool = False):
    """Shared kernel/ref body.

    Shapes: p (BB, cq, 8) RAW moving rows; nm (BB, cq, 3) moving-surface
    normals ALREADY rotated into the fixed frame (sym/gicp modes; ignored
    for "plane"); qvalid (BB, cq); reps_blk (BB, 8); bins_vals
    (BB, cb, 12) = [rep-centered bin points (8) | fixed normals (3) | 0];
    sq_b (BB, cb) masked |b|^2; G (8, 8), b_row (1, 8) accumulated
    similarity (fused_step.prep_similarity). Returns P (BB, 8, 8).

    v_layout selects how the GN row tensor v is laid out for the moment
    contraction (identical math, different Mosaic footprint/speed):
      "sublane": v is (BB, cq, 8) per row (one dot_general per row) —
                 the DEFAULT and the layout the _GN_BYTES_PER_SLOT budget
                 model describes; compiles at every production shape.
      "lane":    v is (BB, 8, R*cq) — components on sublanes, rows x
                 queries on lanes; GICP's three rows collapse into ONE
                 dot_general. EXPERIMENTAL: despite the 12x smaller
                 logical footprint at cq=96, Mosaic allocates ~2x MORE
                 stack for it than for sublane (37.5 MB vs 9.8 MB at
                 plane bb=16 — the broadcast-built v and the lane-axis
                 contraction both relayout through scratch), so it OOMs
                 at the flagship shape; usable only at small shapes for
                 A/B (benchmarks/profile_gn_layout.py).
    """
    qc, one_hot, w = _search_core(p, qvalid, reps_blk, bins_vals[..., :8],
                                  sq_b, G, b_row, alpha, weighted, robust,
                                  delta, in_kernel=in_kernel)
    matched = jax.lax.dot_general(one_hot, bins_vals,
                                  (((2,), (1,)), ((0,), (0,))),
                                  precision=_HI)  # (BB, cq, 12)
    mx, my, mz = qc[..., 0], qc[..., 1], qc[..., 2]
    dx = mx - matched[..., 0]
    dy = my - matched[..., 1]
    dz = mz - matched[..., 2]
    nfx, nfy, nfz = matched[..., 8], matched[..., 9], matched[..., 10]
    ones = jnp.ones_like(mx)

    def row_planes(ux, uy, uz):
        # v = [u, m x u, u . (m - f), 1] as 8 (BB, cq) scalar planes.
        jx = my * uz - mz * uy
        jy = mz * ux - mx * uz
        jz = mx * uy - my * ux
        r = dx * ux + dy * uy + dz * uz
        return (ux, uy, uz, jx, jy, jz, r, ones)

    if mode == "plane":
        rows = [row_planes(nfx, nfy, nfz)]
    elif mode == "plane_sym":
        # Rusinkiewicz symmetric objective: constrain along the averaged
        # fixed+moving normal (zero rows self-mask to the one-sided case).
        nmx, nmy, nmz = nm[..., 0], nm[..., 1], nm[..., 2]
        rows = [row_planes(nfx + nmx, nfy + nmy, nfz + nmz)]
    else:
        # GICP: M = 2I - (1 - eps)(nf nf^T + nm nm^T), 3 rows of L^{-1}.
        nmx, nmy, nmz = nm[..., 0], nm[..., 1], nm[..., 2]
        e = 1.0 - gicp_eps
        m11 = 2.0 - e * (nfx * nfx + nmx * nmx)
        m21 = -e * (nfx * nfy + nmx * nmy)
        m22 = 2.0 - e * (nfy * nfy + nmy * nmy)
        m31 = -e * (nfx * nfz + nmx * nmz)
        m32 = -e * (nfy * nfz + nmy * nmz)
        m33 = 2.0 - e * (nfz * nfz + nmz * nmz)
        u1, u2, u3 = _chol3_inv_rows(m11, m21, m22, m31, m32, m33)
        zeros = jnp.zeros_like(mx)
        rows = [row_planes(u1[0], zeros, zeros),
                row_planes(u2[0], u2[1], zeros),
                row_planes(u3[0], u3[1], u3[2])]

    if v_layout == "lane":
        # (BB, 8, R*cq): component on sublanes, rows x queries on lanes.
        # NOT built with jnp.stack: an 8-way stack along a new sublane axis
        # lowers to tpu.concatenate, which requires identical lane offsets
        # on every input — unsatisfiable when R*cq is not a multiple of 128
        # (the BENCH_r02 failure: "result/input offset mismatch on
        # non-concat dimension" at cq=96, bin_batch=16). Broadcast-select +
        # add is pure elementwise VPU work Mosaic can always relayout, and
        # at (BB, 8, R*cq) size it is noise next to the MXU contraction.
        planes = [jnp.concatenate([r[i] for r in rows], axis=-1)
                  if len(rows) > 1 else rows[0][i] for i in range(8)]
        comp = _lane_iota((1, 8, 1), 1)
        v = planes[0][:, None, :] * (comp == 0).astype(p.dtype)
        for i in range(1, 8):
            v = v + planes[i][:, None, :] * (comp == i).astype(p.dtype)
        wr = (jnp.concatenate([w] * len(rows), axis=-1)
              if len(rows) > 1 else w)
        return jax.lax.dot_general(v * wr[:, None, :], v,
                                   (((2,), (2,)), ((0,), (0,))),
                                   precision=_HI)
    if v_layout == "rowcat":
        # GN rows concatenated along the query (sublane) axis: v is
        # (BB, R*cq, 8) and the whole moment reduction is ONE dot_general
        # with contraction depth R*cq, instead of "sublane"'s R sequential
        # accumulate steps whose intermediates the Mosaic stack allocator
        # keeps live simultaneously (the GICP bb=8 VMEM ceiling —
        # VERDICT r2). cq is a multiple of 8, so the sublane concat is
        # always layout-legal. Single-row modes reduce to "sublane"
        # exactly.
        v = (jnp.concatenate([jnp.stack(r, axis=-1) for r in rows], axis=1)
             if len(rows) > 1 else jnp.stack(rows[0], axis=-1))
        wr = (jnp.concatenate([w] * len(rows), axis=-1)
              if len(rows) > 1 else w)
        return jax.lax.dot_general(v * wr[..., None], v,
                                   (((1,), (1,)), ((0,), (0,))),
                                   precision=_HI)
    assert v_layout == "sublane", v_layout
    P = jnp.zeros(p.shape[:1] + (8, 8), p.dtype)
    for r in rows:
        v = jnp.stack(r, axis=-1)  # (BB, cq, 8)
        P = P + jax.lax.dot_general(v * w[..., None], v,
                                    (((1,), (1,)), ((0,), (0,))),
                                    precision=_HI)
    return P


def _make_gn_kernel(mode: str, weighted: bool, robust: str, with_nm: bool,
                    v_layout: str = "sublane"):
    if with_nm:
        def kernel(p_ref, nm_ref, qvalid_ref, reps_ref, vals_ref, sq_b_ref,
                   g_ref, b_ref, scal_ref, out_ref):
            out_ref[:] = _gn_math(
                p_ref[:], nm_ref[:], qvalid_ref[:], reps_ref[:], vals_ref[:],
                sq_b_ref[:], g_ref[:], b_ref[:], scal_ref[0, 0], mode,
                weighted, robust, scal_ref[0, 1], scal_ref[0, 2],
                v_layout=v_layout, in_kernel=True)
    else:
        def kernel(p_ref, qvalid_ref, reps_ref, vals_ref, sq_b_ref,
                   g_ref, b_ref, scal_ref, out_ref):
            out_ref[:] = _gn_math(
                p_ref[:], None, qvalid_ref[:], reps_ref[:], vals_ref[:],
                sq_b_ref[:], g_ref[:], b_ref[:], scal_ref[0, 0], mode,
                weighted, robust, scal_ref[0, 1], scal_ref[0, 2],
                v_layout=v_layout, in_kernel=True)
    return kernel


@functools.partial(jax.jit, static_argnames=("mode", "weighted", "robust",
                                             "bin_batch", "interpret",
                                             "v_layout",
                                             "vmem_limit_bytes"))
def bin_gn_moments_pallas(mg: jnp.ndarray, nm: jnp.ndarray | None,
                          qvalid: jnp.ndarray, reps: jnp.ndarray,
                          bins_vals: jnp.ndarray, sq_b_masked: jnp.ndarray,
                          G: jnp.ndarray, b_row: jnp.ndarray, alpha, *,
                          mode: str, weighted: bool, robust: str = "none",
                          robust_delta=0.0, gicp_eps=0.0,
                          bin_batch: int = 0, v_layout: str = "sublane",
                          vmem_limit_bytes: int = 0,
                          interpret: bool = False) -> jnp.ndarray:
    """Fused per-bin search + weighting + GN-row moment reduction.

    Args:
      mg: (n_r, cq, 8) bin-grouped RAW moving rows (transform in-kernel).
      nm: (n_r, cq, 3) grouped moving normals rotated into the fixed frame
        (required for "plane_sym"/"gicp"; pass None for "plane").
      qvalid: (n_r, cq) f32 slot validity from the grouping.
      reps: (n_r, 8) representatives (per-bin centering).
      bins_vals: (n_r, cb, 12) = [rep-centered bin points | normals | 0]
        (RBCIndex.bins_vals12).
      sq_b_masked: (n_r, cb) masked |b|^2 (+inf on invalid slots).
      G, b_row: accumulated similarity (fused_step.prep_similarity).
      alpha: photometric blend (traced scalar).
      mode: "plane" | "plane_sym" | "gicp" (static).
      weighted / robust / robust_delta: residual weighting as in the POINT
        kernel (reference icpComputeReduceWeights x robust IRLS factor).
      gicp_eps: disk-covariance thickness (traced; gicp mode only).
      bin_batch: bins per grid step (0 = VMEM-aware auto).
    Returns:
      (n_r, 8, 8) per-bin GN moment matrices P_b in the rep-centered
      frame (see module docstring for the lane layout).
    """
    assert mode in GN_MODES, mode
    n_r, cq, d = mg.shape
    cb = bins_vals.shape[1]
    dv = bins_vals.shape[2]
    with_nm = mode != "plane"
    if bin_batch == 0:
        bin_batch = _auto_bin_batch_gn(n_r, cq, cb, mode)
        if bin_batch == 0:
            raise ValueError(
                f"no legal VMEM-fitting bin batch at n_r={n_r}, cq={cq}, "
                f"cb={cb}; gate on gn_kernel_fits() and use "
                "bin_gn_moments_ref instead")
    bin_batch = min(bin_batch, n_r)
    assert n_r % bin_batch == 0, (n_r, bin_batch)
    grid = (n_r // bin_batch,)
    scal_arr = jnp.stack([
        jnp.asarray(alpha, mg.dtype),
        jnp.asarray(robust_delta, mg.dtype),
        jnp.asarray(gicp_eps, mg.dtype)]).reshape(1, 3)

    def i3(i):
        return (i, 0, 0)

    def i2(i):
        return (i, 0)

    def full2(i):
        return (0, 0)

    in_specs = [pl.BlockSpec((bin_batch, cq, d), i3,
                             memory_space=pltpu.VMEM)]
    inputs = [mg]
    if with_nm:
        assert nm is not None, mode
        in_specs.append(pl.BlockSpec((bin_batch, cq, nm.shape[2]), i3,
                                     memory_space=pltpu.VMEM))
        inputs.append(nm)
    in_specs += [
        pl.BlockSpec((bin_batch, cq), i2, memory_space=pltpu.VMEM),
        pl.BlockSpec((bin_batch, d), i2, memory_space=pltpu.VMEM),
        pl.BlockSpec((bin_batch, cb, dv), i3, memory_space=pltpu.VMEM),
        pl.BlockSpec((bin_batch, cb), i2, memory_space=pltpu.VMEM),
        pl.BlockSpec((d, d), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d), full2, memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    inputs += [qvalid, reps, bins_vals, sq_b_masked, G, b_row, scal_arr]

    rows_per_pair = 3 if mode == "gicp" else 1
    return pl.pallas_call(
        _make_gn_kernel(mode, weighted, robust, with_nm, v_layout),
        compiler_params=_kernel_compiler_params(vmem_limit_bytes),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bin_batch, d, d), i3,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_r, d, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=(2 * n_r * cq * cb * d * 2
                   + 2 * n_r * cq * d * d * (1 + 2 * rows_per_pair)),
            bytes_accessed=4 * n_r * (cq * d + cb * dv + cb + cq + d * d),
            # 3 sqrt per pair for the GICP Cholesky; 1 rsqrt per pair for
            # Huber's IRLS factor.
            transcendentals=n_r * cq * (3 if mode == "gicp" else 0),
        ),
        interpret=interpret,
    )(*inputs)


def bin_gn_moments_ref(mg: jnp.ndarray, nm: jnp.ndarray | None,
                       qvalid: jnp.ndarray, reps: jnp.ndarray,
                       bins_vals: jnp.ndarray, sq_b_masked: jnp.ndarray,
                       G: jnp.ndarray, b_row: jnp.ndarray, alpha, *,
                       mode: str, weighted: bool, robust: str = "none",
                       robust_delta=0.0, gicp_eps=0.0,
                       v_layout: str = "sublane") -> jnp.ndarray:
    """Plain-XLA twin of :func:`bin_gn_moments_pallas` — the production
    path on CPU backends and the interpret-parity golden."""
    return _gn_math(mg, nm, qvalid, reps, bins_vals, sq_b_masked, G, b_row,
                    jnp.asarray(alpha, mg.dtype), mode, weighted, robust,
                    jnp.asarray(robust_delta, mg.dtype),
                    jnp.asarray(gicp_eps, mg.dtype), v_layout=v_layout)


# ---------------------------------------------------------------------------
# Assembly: per-bin P matrices -> global GN system
# ---------------------------------------------------------------------------


def _gn_T(reps: jnp.ndarray) -> jnp.ndarray:
    """(n_b, 8, 8) per-bin frame-translation congruence factors:
    identity + skew(rep_xyz) in the (3:6, 0:3) block, so that
    v_global = T v_local (m x u picks up rep x u when de-centering m)."""
    n_b = reps.shape[0]
    rx, ry, rz = reps[:, 0], reps[:, 1], reps[:, 2]
    z = jnp.zeros_like(rx)
    S = jnp.stack([jnp.stack([z, -rz, ry], -1),
                   jnp.stack([rz, z, -rx], -1),
                   jnp.stack([-ry, rx, z], -1)], -2)  # (n_b, 3, 3)
    T = jnp.tile(jnp.eye(8, dtype=reps.dtype), (n_b, 1, 1))
    return T.at[:, 3:6, 0:3].set(S)


def gn_v_total(P: jnp.ndarray, reps: jnp.ndarray,
               W_t: jnp.ndarray | None = None) -> jnp.ndarray:
    """Global (8, 8) GN moment matrix V = sum_b T_b P_b T_b^T.

    Additive across disjoint bin sets — shards ``psum`` this 64-float
    matrix (the entire per-iteration PLANE/GICP collective payload).
    With W_t (:func:`gn_translation_tensor`) the congruence is one hoisted
    matvec, like the POINT translation.
    """
    if W_t is not None:
        n_b = P.shape[0]
        return jax.lax.dot_general(
            P.reshape(1, n_b * 64), W_t.reshape(n_b * 64, 64),
            (((1,), (0,)), ((), ())), precision=_HI).reshape(8, 8)
    T = _gn_T(reps)
    return jnp.einsum("bij,bjk,blk->il", T, P, T, precision=_HI)


def gn_translation_tensor(reps: jnp.ndarray) -> jnp.ndarray:
    """Hoisted (n_b, 8, 8, 64) coefficients of :func:`gn_v_total` (linear
    in P, coefficients from the loop-invariant reps — same jacrev trick as
    fused_step.point_translation_tensor)."""
    jac = jax.jacrev(
        lambda P: gn_v_total(P, reps).reshape(64))(
        jnp.zeros((reps.shape[0], 8, 8), reps.dtype))  # (64, n_b, 8, 8)
    return jnp.transpose(jac, (1, 2, 3, 0))


def gn_system_from_V(V: jnp.ndarray, L: float):
    """(H (6, 6), b (6,)) in icp.plane's balanced units from the global V.

    The kernel builds m x u in raw millimeters; dividing the rotation
    rows/cols by L here reproduces plane_system_partials' J = [u ;
    (m x u) / L] balancing exactly (see icp.plane.CHARACTERISTIC_LENGTH_MM).
    """
    d = jnp.concatenate([jnp.ones((3,), V.dtype),
                         jnp.full((3,), 1.0 / L, V.dtype),
                         jnp.ones((2,), V.dtype)])
    Vs = V * d[:, None] * d[None, :]
    return Vs[0:6, 0:6], Vs[0:6, 6]
