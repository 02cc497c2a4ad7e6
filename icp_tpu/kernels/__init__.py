"""Pallas TPU kernels (the hot-path device code)."""

from icp_tpu.kernels.bin_search import bin_search_pallas
from icp_tpu.kernels.brute_nn import brute_nn_pallas, nearest_neighbor_brute_pallas
from icp_tpu.kernels.fused_step import (
    bin_point_moments_pallas,
    rep_assign_pallas,
)
