"""Pallas TPU kernels (the hot-path device code)."""

from icp_tpu.kernels.bin_search import bin_search_pallas
from icp_tpu.kernels.brute_nn import brute_nn_pallas, nearest_neighbor_brute_pallas
from icp_tpu.kernels.bin_moments import bin_moments_pallas
