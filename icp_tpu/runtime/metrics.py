"""Metrics / observability.

The reference's observability is stdout-only: the per-iteration report
(angle/axis/t/s/deltas, src/ocl_icp_sbs.cpp:202-217) and the registration
summary (iterations + latency). This module keeps that surface (the
pipeline classes print it) and adds a structured sink: named counters/
gauges/timings accumulated in-process and dumpable as JSON lines for
dashboards or regression tracking.
"""

from __future__ import annotations

import json
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import numpy as np


@dataclass
class MetricsSink:
    """Accumulates structured metrics; thread-unsafe by design (one per
    engine/session)."""

    run_id: str = "default"
    records: List[Dict[str, Any]] = field(default_factory=list)

    def log(self, name: str, value, **tags) -> None:
        rec = {"ts": time.time(), "run": self.run_id, "metric": name,
               "value": float(np.asarray(value))}
        rec.update(tags)
        self.records.append(rec)

    def log_registration(self, state, latency_ms: float, **tags) -> None:
        """Log the reference's registration summary quantities."""
        from icp_tpu.icp.quaternion import qangle_deg

        self.log("icp.iterations", int(state.k), **tags)
        self.log("icp.latency_ms", latency_ms, **tags)
        self.log("icp.angle_deg", float(qangle_deg(state.q)), **tags)
        self.log("icp.translation_mm",
                 float(np.linalg.norm(np.asarray(state.t))), **tags)
        self.log("icp.scale", float(state.s), **tags)

    def summary(self) -> Dict[str, Dict[str, float]]:
        """Per-metric mean/min/max/count."""
        out: Dict[str, Dict[str, float]] = {}
        for rec in self.records:
            s = out.setdefault(rec["metric"],
                               {"count": 0, "sum": 0.0,
                                "min": float("inf"), "max": float("-inf")})
            v = rec["value"]
            s["count"] += 1
            s["sum"] += v
            s["min"] = min(s["min"], v)
            s["max"] = max(s["max"], v)
        for s in out.values():
            s["mean"] = s["sum"] / s["count"]
        return out

    def dump_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for rec in self.records:
                f.write(json.dumps(rec) + "\n")

    @staticmethod
    def load_jsonl(path: str) -> "MetricsSink":
        sink = MetricsSink()
        with open(path) as f:
            for line in f:
                if line.strip():
                    sink.records.append(json.loads(line))
        return sink
