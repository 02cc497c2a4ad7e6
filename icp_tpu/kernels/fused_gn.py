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

for a direction u with a per-row weight g — the point-to-plane row with
u = n, g = 1 (or the symmetric n_f + R n_m). GICP's 3x3 Mahalanobis
denominator M = C_f + R C_m R^T = 2I - (1-eps)(n_f n_f^T + n_m n_m^T)
(icp.gicp.disk_covariance_sum) has the exact sqrt-free inverse

    M^{-1} = I/2 + e/(4 L_s) s s^T + e/(4 L_t) t t^T
    s = n_f + n_m,  t = n_f - n_m,  c = n_f . n_m,  e = 1 - eps
    L_s = 2 - e (1 + c),  L_t = 2 - e (1 - c)

(s and t are orthogonal for unit/zero normals, diagonalizing the rank-2
update; eigenvalue floor 2 eps keeps the divides f32-safe). Since
J^T M^{-1} J decomposes over M^{-1}'s rank-1 terms and
u^T J = [u ; m x u] (J = [I | -[m]_x], cross product linear in u),
GICP = two data rows (u = s, g = e/4L_s and u = t, g = e/4L_t) plus the
isotropic I/2 term, which the kernel carries as a second, STACK-FREE
moment output P_z = sum w z z^T over z = [m, d, 1, 0];
:func:`gicp_const_moment` expands P_z into the three constant-direction
rows' moment sum in plain XLA outside the kernel. No per-pair
eigendecomposition, no 3x3 solves, and (round 3) no Cholesky: the
closed-form-Cholesky chain this replaces was a ~25-op serial sqrt/divide
dependency that alone cost +0.13 ms of the 0.42 ms round-2 kernel, and
each stacked GN row costs ~0.05-0.08 ms regardless of its direction math
(benchmarks/profile_gicp_anatomy.py) — hence two rows, not three or five.

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
    KERNEL_VMEM_LIMIT's production win. gicp (Woodbury z-moment kernel):
    bb=16 0.449 vs bb=32 0.472 vs bb=8 0.574 ms/iteration.
    The byte-per-slot stack model gates extreme shapes to the XLA twin
    (same rule as fused_step._auto_bin_batch)."""
    out_bytes = n_r * 8 * 128 * 4
    budget = _STACK_BUDGET - out_bytes
    per_bin = _GN_BYTES_PER_SLOT[mode] * cq * cb
    if n_r <= _GN_MAX_FULL_DIM and n_r * per_bin <= budget:
        return n_r
    candidates = (16, 32, 8) if mode == "gicp" else (32, 16, 8)
    for bb in candidates:
        if bb <= n_r and n_r % bb == 0 and bb * per_bin <= budget:
            return bb
    return 0


def gn_kernel_fits(n_r: int, cq: int, cb: int, mode: str) -> bool:
    """True when :func:`bin_gn_moments_pallas` has a legal VMEM-fitting
    auto bin batch at this shape (else callers use the XLA twin)."""
    return _auto_bin_batch_gn(n_r, cq, cb, mode) > 0


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
    similarity (fused_step.prep_similarity). Returns P (BB, 8, 8) for
    the single-row modes; gicp returns (P, P_z) with P the two data
    rows' moment and P_z (BB, 8, 8) the z-moment feeding
    :func:`gicp_const_moment`.

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

    # rows: [(8 scalar planes, per-row weight factor)] — the factor (a
    # python scalar or a (BB, cq) plane) multiplies the shared validity/
    # reference/robust weight w per GN row.
    if mode == "plane":
        rows = [(row_planes(nfx, nfy, nfz), 1.0)]
    elif mode == "plane_sym":
        # Rusinkiewicz symmetric objective: constrain along the averaged
        # fixed+moving normal (zero rows self-mask to the one-sided case).
        nmx, nmy, nmz = nm[..., 0], nm[..., 1], nm[..., 2]
        rows = [(row_planes(nfx + nmx, nfy + nmy, nfz + nmz), 1.0)]
    else:
        # GICP: M = 2I - (1-eps)(nf nf^T + nm nm^T). For unit (or zero)
        # normals, s = nf + nm and t = nf - nm are orthogonal
        # (s.t = |nf|^2 - |nm|^2 = 0), which diagonalizes the rank-2
        # update and gives the EXACT sqrt-free inverse (Woodbury):
        #
        #   M^{-1} = I/2 + e/(4 L_s) s s^T + e/(4 L_t) t t^T,
        #   L_s = 2 - e (1 + c),  L_t = 2 - e (1 - c),  c = nf . nm
        #
        # (L_* >= 2 eps — the disk-covariance eigenvalue floor — so the
        # two divides are f32-safe; verified against np.linalg.inv incl.
        # parallel / anti-parallel / missing normals in
        # tests/test_fused_gn.py). The anisotropic weight is therefore
        # TWO data rows (directions s and t) plus an ISOTROPIC I/2 term.
        # The I/2 term's three constant-direction rows are NOT built as
        # rows: per-row plane stacks are the kernel's unit cost
        # (~0.05-0.08 ms each at the flagship shape, per benchmarks/
        # profile_gicp_anatomy.py — the same probe that retired the
        # round-2 closed-form Cholesky, whose ~25-op serial sqrt/divide
        # chain alone cost +0.13 ms). Their moment sum is linear in the
        # STACK-FREE z-moment P_z = sum_i w_i z_i z_i^T with
        # z = [m, d, 1, 0] (built by lane masks + one constant shift
        # matmul), so the kernel emits P_z as a second output and
        # :func:`gicp_const_moment` assembles the constant-row block in
        # plain XLA on the tiny (n_r, 8, 8) tensor outside the kernel.
        nmx, nmy, nmz = nm[..., 0], nm[..., 1], nm[..., 2]
        e = 1.0 - gicp_eps
        cth = nfx * nmx + nfy * nmy + nfz * nmz
        gs = e / (4.0 * (2.0 - e * (1.0 + cth)))
        gt = e / (4.0 * (2.0 - e * (1.0 - cth)))
        rows = [(row_planes(nfx + nmx, nfy + nmy, nfz + nmz), gs),
                (row_planes(nfx - nmx, nfy - nmy, nfz - nmz), gt)]
        lane = _lane_iota((1, 1, 8), 2)
        mask03 = (lane < 3).astype(p.dtype)
        shift03_36 = jnp.logical_and(
            _lane_iota((8, 8), 1) == _lane_iota((8, 8), 0) + 3,
            _lane_iota((8, 8), 0) < 3).astype(p.dtype)
        dfull = (qc - matched[..., :8]) * mask03
        zrow = (qc * mask03
                + jax.lax.dot_general(dfull, shift03_36,
                                      (((2,), (0,)), ((), ())),
                                      precision=_HI)
                + (lane == 6).astype(p.dtype))
        P_z = jax.lax.dot_general(zrow * w[..., None], zrow,
                                  (((1,), (1,)), ((0,), (0,))),
                                  precision=_HI)

    def with_pz(P):
        return (P, P_z) if mode == "gicp" else P

    w_of = [w * wf for _, wf in rows]  # per-row (BB, cq) weights
    if v_layout == "lane":
        # (BB, 8, R*cq): component on sublanes, rows x queries on lanes.
        # NOT built with jnp.stack: an 8-way stack along a new sublane axis
        # lowers to tpu.concatenate, which requires identical lane offsets
        # on every input — unsatisfiable when R*cq is not a multiple of 128
        # (the BENCH_r02 failure: "result/input offset mismatch on
        # non-concat dimension" at cq=96, bin_batch=16). Broadcast-select +
        # add is pure elementwise VPU work Mosaic can always relayout, and
        # at (BB, 8, R*cq) size it is noise next to the MXU contraction.
        planes = [jnp.concatenate([r[i] for r, _ in rows], axis=-1)
                  if len(rows) > 1 else rows[0][0][i] for i in range(8)]
        comp = _lane_iota((1, 8, 1), 1)
        v = planes[0][:, None, :] * (comp == 0).astype(p.dtype)
        for i in range(1, 8):
            v = v + planes[i][:, None, :] * (comp == i).astype(p.dtype)
        wr = (jnp.concatenate(w_of, axis=-1)
              if len(rows) > 1 else w_of[0])
        return with_pz(jax.lax.dot_general(v * wr[:, None, :], v,
                                           (((2,), (2,)), ((0,), (0,))),
                                           precision=_HI))
    if v_layout == "rowcat":
        # GN rows concatenated along the query (sublane) axis: v is
        # (BB, R*cq, 8) and the whole moment reduction is ONE dot_general
        # with contraction depth R*cq, instead of "sublane"'s R sequential
        # accumulate steps. cq is a multiple of 8, so the sublane concat
        # is always layout-legal. Single-row modes reduce to "sublane"
        # exactly. (Measured a wash kernel-only (profile_gn_rowcat.py)
        # and +1.2% COMPOSED at the flagship GICP shape under the 64 MB
        # limit — alternating same-process A/B, median of 5 pairwise
        # deltas sublane-rowcat = -0.007 ms/iter, every pair negative
        # (benchmarks/profile_gicp_ab2.py; the single-pass ordering in
        # profile_gicp_composed.py that read rowcat 3-5% ahead was chip
        # drift). Kept for A/B only; sublane stays the default.)
        v = (jnp.concatenate([jnp.stack(r, axis=-1) for r, _ in rows],
                             axis=1)
             if len(rows) > 1 else jnp.stack(rows[0][0], axis=-1))
        wr = (jnp.concatenate(w_of, axis=-1)
              if len(rows) > 1 else w_of[0])
        return with_pz(jax.lax.dot_general(v * wr[..., None], v,
                                           (((1,), (1,)), ((0,), (0,))),
                                           precision=_HI))
    assert v_layout == "sublane", v_layout
    P = jnp.zeros(p.shape[:1] + (8, 8), p.dtype)
    for (r, _), wr in zip(rows, w_of):
        v = jnp.stack(r, axis=-1)  # (BB, cq, 8)
        P = P + jax.lax.dot_general(v * wr[..., None], v,
                                    (((1,), (1,)), ((0,), (0,))),
                                    precision=_HI)
    return with_pz(P)


def _make_gn_kernel(mode: str, weighted: bool, robust: str, with_nm: bool,
                    v_layout: str = "sublane"):
    two_out = mode == "gicp"

    if with_nm:
        def kernel(p_ref, nm_ref, qvalid_ref, reps_ref, vals_ref, sq_b_ref,
                   g_ref, b_ref, scal_ref, out_ref, *pz_ref):
            out = _gn_math(
                p_ref[:], nm_ref[:], qvalid_ref[:], reps_ref[:], vals_ref[:],
                sq_b_ref[:], g_ref[:], b_ref[:], scal_ref[0, 0], mode,
                weighted, robust, scal_ref[0, 1], scal_ref[0, 2],
                v_layout=v_layout, in_kernel=True)
            if two_out:
                out_ref[:], pz_ref[0][:] = out
            else:
                out_ref[:] = out
    else:
        assert not two_out, mode  # gicp always passes normals
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
      frame; gicp returns the pair (P_b, P_z_b) — callers add
      ``gicp_const_moment(P_z)`` to P before the global congruence.
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

    out_spec = pl.BlockSpec((bin_batch, d, d), i3, memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n_r, d, d), jnp.float32)
    rows_per_pair = 3 if mode == "gicp" else 1  # 2 data rows + z-moment
    return pl.pallas_call(
        _make_gn_kernel(mode, weighted, robust, with_nm, v_layout),
        compiler_params=_kernel_compiler_params(vmem_limit_bytes),
        grid=grid,
        in_specs=in_specs,
        out_specs=((out_spec, out_spec) if mode == "gicp" else out_spec),
        out_shape=((out_shape, out_shape) if mode == "gicp" else out_shape),
        cost_estimate=pl.CostEstimate(
            flops=(2 * n_r * cq * cb * d * 2
                   + 2 * n_r * cq * d * d * (1 + 2 * rows_per_pair)),
            bytes_accessed=4 * n_r * (cq * d + cb * dv + cb + cq + d * d),
            # GICP's Woodbury weights cost 2 divides per pair (no sqrt);
            # Huber's IRLS factor is 1 rsqrt per pair.
            transcendentals=n_r * cq if robust == "huber" else 0,
        ),
        interpret=interpret,
    )(*inputs)


def bin_gn_moments_ref(mg: jnp.ndarray, nm: jnp.ndarray | None,
                       qvalid: jnp.ndarray, reps: jnp.ndarray,
                       bins_vals: jnp.ndarray, sq_b_masked: jnp.ndarray,
                       G: jnp.ndarray, b_row: jnp.ndarray, alpha, *,
                       mode: str, weighted: bool, robust: str = "none",
                       robust_delta=0.0, gicp_eps=0.0,
                       v_layout: str = "sublane"):
    """Plain-XLA twin of :func:`bin_gn_moments_pallas` — the production
    path on CPU backends and the interpret-parity golden (same return
    convention: gicp yields the (P, P_z) pair)."""
    return _gn_math(mg, nm, qvalid, reps, bins_vals, sq_b_masked, G, b_row,
                    jnp.asarray(alpha, mg.dtype), mode, weighted, robust,
                    jnp.asarray(robust_delta, mg.dtype),
                    jnp.asarray(gicp_eps, mg.dtype), v_layout=v_layout)


def gicp_const_moment(P_z: jnp.ndarray) -> jnp.ndarray:
    """GICP's isotropic-I/2 moment block from the kernel's z-moment.

    The three constant-direction GN rows v_k = B e_k with
    B = [I3; skew(m); d^T; 1^T] (8 x 3) sum to sum_i (w_i/2) B_i B_i^T —
    every entry of B B^T is at most quadratic in (m, d), so the sum is a
    LINEAR function of P_z = sum_i w_i z_i z_i^T, z = [m, d, 1, 0]. This
    expands it on the tiny (n_b, 8, 8) tensors in plain XLA, keeping the
    kernel free of per-row plane stacks (the kernel's unit cost; see
    module docstring). Block identities used (S := skew(m)):
    S S^T = |m|^2 I - m m^T;  S d = m x d;  S 1 = m x 1.
    """
    Mm = P_z[:, 0:3, 0:3]
    Md = P_z[:, 3:6, 3:6]
    Mmd = P_z[:, 0:3, 3:6]
    sw = P_z[:, 6, 6]
    sm = P_z[:, 0:3, 6]
    sd = P_z[:, 3:6, 6]
    dt = P_z.dtype
    eye3 = jnp.eye(3, dtype=dt)

    def skew(v):
        z = jnp.zeros_like(v[:, 0])
        return jnp.stack([
            jnp.stack([z, -v[:, 2], v[:, 1]], -1),
            jnp.stack([v[:, 2], z, -v[:, 0]], -1),
            jnp.stack([-v[:, 1], v[:, 0], z], -1)], -2)

    S_sm = skew(sm)
    cross_md = jnp.stack([Mmd[:, 1, 2] - Mmd[:, 2, 1],
                          Mmd[:, 2, 0] - Mmd[:, 0, 2],
                          Mmd[:, 0, 1] - Mmd[:, 1, 0]], -1)  # sum w m x d
    m_x_1 = jnp.stack([sm[:, 1] - sm[:, 2],
                       sm[:, 2] - sm[:, 0],
                       sm[:, 0] - sm[:, 1]], -1)             # sum w m x 1
    tr_Mm = jnp.trace(Mm, axis1=1, axis2=2)
    tr_Md = jnp.trace(Md, axis1=1, axis2=2)
    ones3 = jnp.ones((3,), dt)

    top = jnp.concatenate([
        sw[:, None, None] * eye3, -S_sm, sd[:, :, None],
        sw[:, None, None] * ones3[:, None]], axis=2)          # (n_b, 3, 8)
    mid = jnp.concatenate([
        S_sm, tr_Mm[:, None, None] * eye3 - Mm, cross_md[:, :, None],
        m_x_1[:, :, None]], axis=2)                           # (n_b, 3, 8)
    r6 = jnp.concatenate([
        sd, cross_md, tr_Md[:, None],
        jnp.sum(sd, axis=1, keepdims=True)], axis=1)[:, None] # (n_b, 1, 8)
    r7 = jnp.concatenate([
        sw[:, None] * ones3, m_x_1, jnp.sum(sd, axis=1, keepdims=True),
        3.0 * sw[:, None]], axis=1)[:, None]                  # (n_b, 1, 8)
    return 0.5 * jnp.concatenate([top, mid, r6, r7], axis=1)


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
