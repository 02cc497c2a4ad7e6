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
    bm = _auto_block_m(65536, 1024)
    assert bm * 1024 * 4 <= 2 * 1024 * 1024  # score block <= 2 MB
    assert 65536 % bm == 0 and bm >= 128


def test_rep_assign_block_divides_odd_sizes():
    # non-power-of-two m must still produce a divisor
    for m in (512, 4096, 300, 24576):
        bm = _auto_block_m(m, 256)
        assert m % bm == 0


def test_moments_bin_batch_flagship_keeps_32():
    assert moments_bb(256, 128, 128) == 32


def test_moments_bin_batch_shrinks_at_1024_bins():
    # n_r=1024 OOMed at bin_batch=32 (17.84 MB); auto must drop it
    bb = moments_bb(1024, 128, 128)
    assert bb <= 16 and 1024 % bb == 0
    out_bytes = 1024 * 8 * 128 * 4
    assert bb * 28 * 128 * 128 + out_bytes <= 15 * 1024 * 1024


def test_search_bin_batch_shrinks_at_gicp_payload():
    # v=12 at bin_batch=32 measured 18.56 MB; auto must keep under 15 MB
    bb = search_bb(256, 128, 128, 12)
    assert bb * (34 * 128 * 128 + 16 * 128 * 12) <= 15 * 1024 * 1024
    assert 256 % bb == 0


def test_batches_always_divide():
    for n_r in (4, 16, 64, 256, 1024):
        for cap in (16, 128, 256, 512):
            assert n_r % moments_bb(n_r, cap, cap) == 0
            assert n_r % search_bb(n_r, cap, cap, 8) == 0
