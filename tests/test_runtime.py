"""Runtime-layer tests: timing harness, metrics sink, distributed helpers."""

import json

import numpy as np
import jax
import jax.numpy as jnp

from icp_tpu.runtime.metrics import MetricsSink
from icp_tpu.runtime.timing import CPUTimer, ProfilingInfo, device_time


def test_cpu_timer():
    with CPUTimer() as t:
        x = sum(range(100000))
    assert t.span_ms > 0


def test_device_time_runs():
    f = jax.jit(lambda x: x * 2 + 1)
    ms = device_time(f, jnp.ones((64, 64)), reps=2)
    assert ms >= 0


def test_profiling_info_summary():
    info = ProfilingInfo("test")
    with info.span("phase_a"):
        pass
    info.record("phase_b", 1.5)
    info.record("phase_b", 2.5)
    s = info.summary()
    assert "phase_a" in s and "phase_b" in s
    assert abs(info.mean("phase_b") - 2.0) < 1e-9
    assert abs(info.total("phase_b") - 4.0) < 1e-9


def test_metrics_sink_roundtrip(tmp_path):
    sink = MetricsSink(run_id="r1")
    sink.log("fps", 30.5, config="flagship")
    sink.log("fps", 29.5)
    sink.log("ate_mm", 4.2)
    s = sink.summary()
    assert s["fps"]["count"] == 2
    assert abs(s["fps"]["mean"] - 30.0) < 1e-9

    p = str(tmp_path / "metrics.jsonl")
    sink.dump_jsonl(p)
    back = MetricsSink.load_jsonl(p)
    assert len(back.records) == 3
    assert back.records[0]["config"] == "flagship"


def test_metrics_log_registration():
    from icp_tpu.icp.state import identity_state

    sink = MetricsSink()
    sink.log_registration(identity_state(), 12.5, pair="a-b")
    names = {r["metric"] for r in sink.records}
    assert {"icp.iterations", "icp.latency_ms", "icp.angle_deg",
            "icp.translation_mm", "icp.scale"} <= names


def test_make_global_mesh_single_process():
    from icp_tpu.parallel.distributed import make_global_mesh

    mesh = make_global_mesh(n_mp=2)
    assert mesh.shape["mp"] == 2
    assert mesh.shape["dp"] == len(jax.devices()) // 2


def test_local_shard_single_process():
    from icp_tpu.parallel.distributed import local_shard, make_global_mesh

    mesh = make_global_mesh(n_mp=1)
    arr = np.arange(16 * 3).reshape(16, 3)
    sl = local_shard(arr, mesh)
    # Single process owns all rows.
    np.testing.assert_array_equal(sl, arr)
