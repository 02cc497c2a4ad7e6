"""Runtime layer: configuration, timing, metrics, native bindings."""

from icp_tpu.runtime.config import (
    Correspondence,
    ICPConfig,
    ICPParams,
    Objective,
    RotationMode,
    Weighting,
)
from icp_tpu.runtime.timing import CPUTimer, ProfilingInfo, device_time, marginal_time
from icp_tpu.runtime.metrics import MetricsSink
