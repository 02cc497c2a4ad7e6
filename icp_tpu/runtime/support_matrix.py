"""The supported-configuration matrix: every Pallas-kernel invocation
(kernel x mode x auto-selected block shape) reachable from configurations
the framework promises to run on TPU hardware.

Round 2 lost its benchmark capture because a kernel variant that had never
been compiled on hardware became reachable from the DEFAULT config after a
capacity-policy change (interpret-mode CPU tests are structurally blind to
Mosaic lowering legality — see kernels/fused_gn.py). This module is the
fix's source of truth, consumed from both sides:

- ``benchmarks/smoke_fused_hw.py`` iterates :func:`kernel_rows`, compiles
  and parity-checks every row on the real chip, and writes the results to
  ``benchmarks/hw_compile_table.json`` (the pre-snapshot ritual — run it
  after ANY change to a kernel body, a ``_auto_*`` block policy, or the
  capacity defaults in runtime.config).
- ``tests/test_kernel_blocks.py`` asserts (on CPU, every run) that each
  row's key is present and ``ok`` in the checked-in table — so the VMEM
  budget models can never steer production onto an unverified shape
  without a test failing and pointing at the ritual.

The reference's analog is its per-kernel device tests, which require a
real OpenCL device (reference tests/testsICP.cpp:66-1052); here the CPU
suite stays hermetic and the hardware evidence is a checked-in artifact.
"""

from __future__ import annotations

from typing import Iterator, NamedTuple

HW_TABLE_PATH = "benchmarks/hw_compile_table.json"

# Robust kernels exercised per shape class: the full set only at the
# flagship shape (robust variants change the kernel body, not its block
# layout, so one shape class covers the body; every shape class covers
# the layouts with the default body).
_ROBUST_FULL = ("none", "trimmed", "huber", "tukey")


class KernelRow(NamedTuple):
    """One hardware-verifiable kernel invocation.

    key: stable identifier carrying the kernel, block-relevant shape, and
      auto-selected block size — if ANY of those change, the key changes
      and the checked-in table no longer covers it.
    kind: "repassign" | "point" | "gn" | "binsearch" | "brute".
    shape_class: name from :func:`shape_classes`.
    mode / weighted / robust / with_normals: variant selectors (unused
      fields hold the kind's defaults).
    """

    key: str
    kind: str
    shape_class: str
    mode: str = "plane"
    weighted: bool = True
    robust: str = "none"
    with_normals: bool = False


def shape_classes():
    """name -> base ICPConfig for every supported shape class.

    flagship: the reference workload (m=16384, n_r=256).
    pyr2/pyr4: the pyramid's coarse levels of the flagship config
      (icp.pyramid._level_config with strides 2 and 4).
    4x: the scaled workload (m=65536, n_r=1024) from the round-2 scaling
      profile.
    """
    from icp_tpu.icp.pyramid import _level_config
    from icp_tpu.runtime.config import ICPConfig

    base = ICPConfig()
    return {
        "pyr4": _level_config(base, 4),
        "pyr2": _level_config(base, 2),
        "flagship": base,
        "4x": ICPConfig(m=65536, n_r=1024),
    }


def _dims(cfg):
    return cfg.n_r, cfg.query_capacity, cfg.bin_capacity


def kernel_rows() -> Iterator[KernelRow]:
    """Yield every row of the support matrix (deterministic order)."""
    from icp_tpu.kernels import bin_search, fused_gn, fused_step

    for name, cfg in shape_classes().items():
        n_r, cq, cb = _dims(cfg)
        flag = name == "flagship"

        bm = fused_step._auto_block_m(cfg.m, n_r)
        yield KernelRow(f"repassign|m{cfg.m}|nr{n_r}|bm{bm}",
                        "repassign", name)
        # Assignment + free per-bin counts (sequential-grid accumulation)
        # — the production assignment since round 4.
        yield KernelRow(f"repassignc|m{cfg.m}|nr{n_r}|bm{bm}",
                        "repassignc", name)

        bb = fused_step._auto_bin_batch(n_r, cq, cb)
        for weighted in ((True, False) if flag else (True,)):
            for robust in (_ROBUST_FULL if flag else ("none",)):
                yield KernelRow(
                    f"point|{n_r}x{cq}x{cb}|w{int(weighted)}|{robust}|bb{bb}",
                    "point", name, weighted=weighted, robust=robust)

        # d2-only pass (adaptive robust scale) — same block policy as the
        # moment kernel.
        yield KernelRow(f"mindist|{n_r}x{cq}x{cb}|bb{bb}", "mindist", name)

        # Padded bin-table build (kernels.table_build): d=8 groups queries
        # alone (POINT/PLANE), d=11 groups queries ++ moving normals
        # (plane_sym/GICP). The key carries m — the full sorted array is
        # the kernel's VMEM block, so legality depends on it.
        from icp_tpu.kernels import table_build

        for d in (8, 11):
            if table_build.table_kernel_fits(cfg.m, n_r, cq, d):
                bbt = table_build._auto_bin_batch_table(n_r)
                yield KernelRow(
                    f"table|m{cfg.m}|nr{n_r}|cap{cq}|d{d}|bb{bbt}",
                    "table", name, with_normals=d == 11)

        for mode in fused_gn.GN_MODES:
            bbg = fused_gn._auto_bin_batch_gn(n_r, cq, cb, mode)
            variants = ([(True, "none"), (True, "trimmed"), (False, "none")]
                        if flag else [(True, "none")])
            for weighted, robust in variants:
                yield KernelRow(
                    f"gn-{mode}|{n_r}x{cq}x{cb}|w{int(weighted)}|{robust}"
                    f"|bb{bbg}",
                    "gn", name, mode=mode, weighted=weighted, robust=robust)

        for with_normals in (False, True):
            v = 12 if with_normals else 8
            bbs = bin_search._auto_bin_batch(n_r, cq, cb, v)
            yield KernelRow(
                f"binsearch|{n_r}x{cq}x{cb}|v{v}|bb{bbs}",
                "binsearch", name, with_normals=with_normals)

        if flag:
            yield KernelRow(f"brute|m{cfg.m}|n{cfg.m}", "brute", name)
