"""Coarse-to-fine pyramid registration.

Beyond-reference robustness feature: single-level photogeometric ICP has a
convergence basin of roughly the landmark spacing (SURVEY-documented lattice
physics); large inter-frame motions (camera shake, dropped frames) fall
outside it. The pyramid runs ICP on subsampled landmark grids first — a
4x-subsampled grid has 4x the spacing and therefore ~4x the basin — and
refines through the levels, warm-starting each from the previous estimate.

Levels operate on the organized 128x128 landmark grid by strided
subsampling (the same mechanism the reference's own getReps uses to thin
the grid), so each level is exactly the flagship pipeline at a smaller m.
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Union

import dataclasses

import jax
import jax.numpy as jnp

from icp_tpu.icp.run import build_index, icp_run
from icp_tpu.icp.state import ICPState, identity_state
from icp_tpu.ops.sampling import LM_GRID
from icp_tpu.runtime.config import Correspondence, ICPConfig, ICPParams


def subsample_grid(landmarks8: jnp.ndarray, stride: int,
                   grid: int = LM_GRID) -> jnp.ndarray:
    """Strided subsample of an organized (grid*grid, 8) landmark set.

    ``stride`` must divide the grid (else the level's point count would
    disagree with the level config's m)."""
    if stride == 1:
        return landmarks8
    if grid % stride != 0:
        raise ValueError(f"stride {stride} must divide the grid size {grid}")
    g = landmarks8.reshape(grid, grid, 8)
    off = stride // 2
    sub = g[off::stride, off::stride]
    return sub.reshape(-1, 8)


def _level_config(config: ICPConfig, stride: int) -> ICPConfig:
    if stride == 1:
        return config
    if LM_GRID % stride != 0:
        raise ValueError(f"stride {stride} must divide the grid size {LM_GRID}")
    m = (LM_GRID // stride) ** 2
    n_r = max(config.n_r // (stride * stride), 16)
    # round n_r down to a power of two (rep-grid constraint)
    n_r = 1 << (n_r.bit_length() - 1)
    return dataclasses.replace(
        config, m=m, n_r=n_r, bin_capacity=0, query_capacity=0)


@partial(jax.jit, static_argnames=("config",))
def _level(fixed8, moving8, params, config, init):
    """One pyramid level as a single jitted dispatch (index build + the
    full registration while_loop), warm-started from ``init``."""
    from icp_tpu.runtime.config import Correspondence, Objective

    if config.correspondence is Correspondence.RBC:
        target: Union[object, jnp.ndarray] = build_index(fixed8, params,
                                                         config)
    elif config.needs_normals:
        from icp_tpu.icp.step import BruteTarget
        from icp_tpu.ops.normals import normals_for

        target = BruteTarget(
            db=fixed8, normals=normals_for(fixed8, config.normal_mode))
    else:
        target = fixed8
    return icp_run(moving8, target, params, config, init=init)


def register_pyramid(fixed8: jnp.ndarray, moving8: jnp.ndarray,
                     params: ICPParams, config: ICPConfig,
                     strides: Sequence[int] = (4, 2, 1)) -> ICPState:
    """Coarse-to-fine registration over subsampled landmark grids.

    Args:
      fixed8, moving8: (16384, 8) organized landmark sets (128x128 order).
      strides: grid subsampling per level, coarse to fine (each must divide
        the grid); the last level should be 1 (full resolution).
    Returns:
      the finest level's ICPState (iteration count is per-level).
    """
    state = identity_state(fixed8.dtype)
    for stride in strides:
        cfg = _level_config(config, stride)
        f = subsample_grid(fixed8, stride)
        m = subsample_grid(moving8, stride)
        # Warm start from the previous level; reset the iteration counter
        # so each level gets its full budget. One dispatch per level.
        state = state._replace(k=jnp.zeros((), jnp.int32))
        state = _level(f, m, params, cfg, state)
    return state
