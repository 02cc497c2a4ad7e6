"""Algorithm-composition layer (reference L3: ICPStep / ICP)."""

from icp_tpu.icp.horn import (
    build_N,
    solve_rotation_jacobi,
    solve_rotation_power,
    solve_rotation_svd,
    solve_step_transform,
)
from icp_tpu.icp.pipeline import ICPRegistration, ICPStepByStep
from icp_tpu.icp.plane import solve_point_to_plane
from icp_tpu.icp.run import build_index, icp_run, register
from icp_tpu.icp.state import ICPState, identity_state
from icp_tpu.icp.step import icp_step
from icp_tpu.icp.pyramid import register_pyramid, subsample_grid
