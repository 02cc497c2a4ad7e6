"""Distributed execution: device meshes, sharded ICP, multi-host init."""

from icp_tpu.parallel.mesh import DP_AXIS, MP_AXIS, make_mesh
from icp_tpu.parallel.sharded import make_sharded_register
from icp_tpu.parallel.distributed import initialize_multihost, make_global_mesh
from icp_tpu.parallel.resilience import device_healthy, with_retries
