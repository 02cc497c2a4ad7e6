"""VMEM-aware auto block sizing of the Pallas kernels (pure functions).

The fixed block sizes OOMed Mosaic's 16 MB scoped VMEM at n_r = 1024
(moments kernel: 17.84 MB measured; bin search at the GICP payload width:
18.56 MB) — these tests pin the auto heuristics to the measured anchors
so a regression is a test failure, not a hardware-only compile crash.
"""

from icp_tpu.kernels.bin_search import _auto_bin_batch as search_bb
from icp_tpu.kernels.fused_step import _auto_bin_batch as moments_bb
from icp_tpu.kernels.fused_step import _auto_block_m


def test_rep_assign_block_flagship_unchanged():
    # measured-good configuration must stay: 2048 x 256 scores = 2 MB
    assert _auto_block_m(16384, 256) == 2048


def test_rep_assign_block_shrinks_at_wide_reps():
    # Round-4 allowance: 8 MB score blocks (2048x1024 measured ~2% faster
    # composed than the old 512 cap at 65536x1024 — alternating A/B,
    # benchmarks/probe_assign_ab.py). Still bounded: much wider rep counts
    # must shrink the block below DEFAULT_BLOCK_M.
    bm = _auto_block_m(65536, 1024)
    assert bm == 2048  # full DEFAULT_BLOCK_M rides the 8 MB allowance
    bm_wide = _auto_block_m(65536, 8192)
    assert bm_wide * 8192 * 4 <= 8 * 1024 * 1024  # score block <= 8 MB
    assert 65536 % bm_wide == 0 and bm_wide >= 128


def test_rep_assign_block_divides_odd_sizes():
    # non-power-of-two m must still produce a divisor
    for m in (512, 4096, 300, 24576):
        bm = _auto_block_m(m, 256)
        assert m % bm == 0


def test_moments_bin_batch_flagship_keeps_32():
    # bb=32 is the measured FULL-ITERATION optimum (round-3 registration
    # A/B: 0.364 ms vs 0.391 at bb=64, even though the isolated kernel
    # scan prefers 64) — composition, not kernel-only speed, decides.
    assert moments_bb(256, 128, 128) == 32
    assert moments_bb(256, 96, 128) == 32


def test_moments_bin_batch_fits_budget_at_1024_bins():
    # n_r=1024's 4 MB padded output eats into the stack budget; auto must
    # stay within _STACK_BUDGET
    from icp_tpu.kernels.fused_step import _STACK_BUDGET

    bb = moments_bb(1024, 128, 128)
    assert bb == 32 and 1024 % bb == 0
    out_bytes = 1024 * 8 * 128 * 4
    assert bb * 28 * 128 * 128 + out_bytes <= _STACK_BUDGET


def test_gn_bin_batch_measured_preferences():
    # plane rides the raised VMEM limit to bb=32 (17.8 MB stack — the
    # exact shape the default 16 MB Mosaic limit rejected in round 2);
    # gicp's Woodbury z-moment kernel measures fastest at 16
    # (0.449 vs 0.472 at 32 / 0.574 at 8 ms/iteration).
    from icp_tpu.kernels.fused_gn import _auto_bin_batch_gn

    assert _auto_bin_batch_gn(256, 96, 128, "plane") == 32
    assert _auto_bin_batch_gn(256, 96, 128, "plane_sym") == 32
    assert _auto_bin_batch_gn(256, 96, 128, "gicp") == 16


def test_search_bin_batch_shrinks_at_gicp_payload():
    # v=12 at bin_batch=32 measured 18.56 MB; auto must keep under 15 MB
    bb = search_bb(256, 128, 128, 12)
    assert bb * (34 * 128 * 128 + 16 * 128 * 12) <= 15 * 1024 * 1024
    assert 256 % bb == 0


def test_batches_always_divide_and_are_mosaic_legal():
    """Every non-zero batch must divide n_r AND satisfy Mosaic's sublane
    rule for the kernels' (bin_batch, capacity) 2-D blocks: a multiple of
    8 or the full array dim. 0 = no legal batch fits VMEM (callers fall
    back to the XLA twin)."""
    # Includes NON-power-of-two n_r: halving a start like 24 once landed
    # on the illegal sublane size 12 (neither x8 nor full-dim).
    for n_r in (4, 16, 20, 24, 28, 48, 64, 192, 256, 1024):
        for cap in (16, 128, 256, 512):
            for bb in (moments_bb(n_r, cap, cap),
                       search_bb(n_r, cap, cap, 8)):
                if bb == 0:
                    continue
                assert n_r % bb == 0, (n_r, cap, bb)
                assert bb % 8 == 0 or bb == n_r, (n_r, cap, bb)
    # The regression shape the halving bug produced: n_r=24 at capacities
    # where 12 would "fit" the byte model but violates the sublane rule.
    # Legal outcomes: the full-dim block (24 == n_r, allowed since the
    # round-3 budget raise), a multiple of 8, or the XLA fallback.
    for bb in (moments_bb(24, 128, 256), search_bb(24, 128, 256, 12)):
        assert bb in (0, 8, 24), bb


def test_big_capacity_shapes_fall_back():
    """m=65536, n_r=256 (mean occupancy 256 -> capacities 384/512): the
    old auto sizing returned bin_batch=2, whose (2, 384) block violates
    Mosaic's sublane tiling and failed to LOWER on hardware. Auto must
    return 0 (XLA-twin fallback) instead."""
    assert moments_bb(256, 384, 512) == 0
    assert search_bb(16, 512, 512, 12) == 0

    import jax.numpy as jnp
    import pytest

    from icp_tpu.kernels.fused_step import (
        bin_point_moments_pallas,
        moments_kernel_fits,
    )

    assert not moments_kernel_fits(256, 384, 512)
    assert moments_kernel_fits(256, 96, 128)  # flagship still kernels
    z = jnp.zeros
    with pytest.raises(ValueError, match="moments_kernel_fits"):
        bin_point_moments_pallas(
            z((256, 384, 8)), z((256, 384)), z((256, 8)), z((256, 512, 8)),
            z((256, 512)), jnp.eye(8), z((1, 8)), 1.0, weighted=True,
            interpret=True)


def test_auto_selected_shapes_are_hardware_verified():
    """Every kernel invocation reachable from a supported config must be
    recorded ``ok`` in the checked-in hardware compile/parity table.

    This is the loop-closer for the round-2 regression class: a capacity-
    policy or block-policy change moves production onto a block shape that
    interpret-mode CPU tests cannot compile-check. If this test fails, the
    fix is to run ``python benchmarks/smoke_fused_hw.py`` ON THE TPU (the
    pre-snapshot ritual) and commit the regenerated
    benchmarks/hw_compile_table.json — after making the new shape pass.
    """
    import json
    import pathlib

    from icp_tpu.runtime import support_matrix

    table_path = (pathlib.Path(__file__).resolve().parent.parent
                  / support_matrix.HW_TABLE_PATH)
    with open(table_path) as f:
        table = json.load(f)
    missing = [r.key for r in support_matrix.kernel_rows()
               if r.key not in table]
    assert not missing, (
        f"kernel shapes never compiled on hardware: {missing} — run "
        "benchmarks/smoke_fused_hw.py on the TPU and commit the table")
    bad = [r.key for r in support_matrix.kernel_rows()
           if not table[r.key]["ok"]]
    assert not bad, f"kernel shapes failing on hardware: {bad}"
    # The e2e compositions must be green too.
    for key in ("e2e-point", "e2e-plane", "e2e-gicp"):
        assert table.get(key, {}).get("ok"), key


def test_fused_path_falls_back_at_big_capacity(rng):
    """rbc_point_moments with use_pallas=True at a no-legal-batch shape
    must silently take the XLA twin (not raise), and match it exactly."""
    import jax.numpy as jnp
    import numpy as np

    from icp_tpu.icp.state import identity_state
    from icp_tpu.rbc.construct import rbc_construct
    from icp_tpu.rbc.search import rbc_point_moments
    from tests.utils import make_cloud8

    from icp_tpu.kernels.fused_step import moments_kernel_fits

    db = make_cloud8(rng, 256)
    reps = db[rng.choice(256, 4, replace=False)]
    # cb=768 with n_r=4: 28 B/slot x 768 x 768 x 4 bins exceeds the stack
    # budget even for the full-dim block (the raised round-3 budget admits
    # the old 512 shape, which now legitimately takes the kernel).
    assert not moments_kernel_fits(4, 768, 768)
    idx = rbc_construct(jnp.asarray(db), jnp.asarray(reps),
                        jnp.float32(150.0), 768)
    moving = jnp.asarray(make_cloud8(rng, 256))
    st = identity_state()
    kw = dict(weighted=True)
    out_p = rbc_point_moments(idx, moving, st.q, st.t, st.s,
                              jnp.float32(150.0), jnp.float32(1e-6), 768,
                              use_pallas=True, interpret=True, **kw)
    out_r = rbc_point_moments(idx, moving, st.q, st.t, st.s,
                              jnp.float32(150.0), jnp.float32(1e-6), 768,
                              use_pallas=False, **kw)
    for a, b in zip(out_p, out_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
