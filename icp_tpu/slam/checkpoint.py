"""Checkpoint / resume for SLAM sessions.

The reference persists nothing beyond the captured ``.bin`` clouds
(SURVEY.md §5 "Checkpoint/resume — absent"); a long-running mapping engine
needs durable snapshots. Two backends:

  * orbax (preferred when importable): async-capable, handles sharded jax
    arrays on multi-host runs.
  * npz fallback: a versioned single-file snapshot — robust everywhere.

Snapshot content: trajectory, keyframes (pose + landmarks + frame index),
pose-graph edges/measurements/weights, loop closures.
"""

from __future__ import annotations

import dataclasses
import enum
import json
import os
from typing import Optional

import jax.numpy as jnp
import numpy as np

from icp_tpu.slam import se3
from icp_tpu.slam.mapping import Keyframe, SlamEngine, SlamMap

FORMAT_VERSION = 1


def _to_np(x):
    return np.asarray(x)


def _payload(engine: SlamEngine) -> dict:
    m = engine.map
    if not engine.trajectory:
        raise ValueError("nothing to save: engine has processed no frames")
    return {
        # The LAST PROCESSED frame's landmarks (not the last keyframe's):
        # odometry resumes relative to trajectory[-1], so _prev_lms must be
        # that frame's landmarks or every post-resume pose inherits the
        # keyframe-to-frame offset.
        "last_lms": (_to_np(engine._prev_lms)
                     if engine._prev_lms is not None
                     else np.zeros((0, 8), np.float32)),
        "version": np.int32(FORMAT_VERSION),
        "traj_q": np.stack([_to_np(p.q) for p in engine.trajectory]),
        "traj_t": np.stack([_to_np(p.t) for p in engine.trajectory]),
        "kf_index": np.asarray([k.index for k in m.keyframes], np.int32),
        "kf_q": np.stack([_to_np(k.pose.q) for k in m.keyframes]),
        "kf_t": np.stack([_to_np(k.pose.t) for k in m.keyframes]),
        "kf_landmarks": np.stack([_to_np(k.landmarks) for k in m.keyframes]),
        "edges": np.asarray(m.edges, np.int32).reshape(-1, 2),
        "meas_q": (np.stack([_to_np(z.q) for z in m.measurements])
                   if m.measurements else np.zeros((0, 4), np.float32)),
        "meas_t": (np.stack([_to_np(z.t) for z in m.measurements])
                   if m.measurements else np.zeros((0, 3), np.float32)),
        "weights": np.asarray(m.weights, np.float32),
        "loop_closures": np.asarray(m.loop_closures, np.int32).reshape(-1, 2),
        "meta": np.frombuffer(json.dumps({
            "m": engine.config.m,
            "n_r": engine.config.n_r,
            "gap_since_kf": engine._gap_since_kf,
            # Full algorithm configuration: a resumed session must run the
            # SAME algorithm that produced the snapshot, not defaults.
            "config": _config_dict(engine.config),
            "params": {
                "alpha": float(engine.params.alpha),
                "c": float(engine.params.c),
                "angle_threshold_deg": float(
                    engine.params.angle_threshold_deg),
                "translation_threshold": float(
                    engine.params.translation_threshold),
                "gicp_epsilon": float(engine.params.gicp_epsilon),
                "robust_delta": float(engine.params.robust_delta),
            },
            "policy": dataclasses.asdict(engine.policy),
            "loop_config": dataclasses.asdict(engine.loop_config),
            "use_pyramid": engine.use_pyramid,
            "pyramid_strides": list(engine.pyramid_strides),
        }).encode(), dtype=np.uint8),
    }


def _config_dict(config) -> dict:
    """ICPConfig -> JSON-safe dict (enums by value)."""
    out = {}
    for f in dataclasses.fields(config):
        v = getattr(config, f.name)
        out[f.name] = v.value if isinstance(v, enum.Enum) else v
    return out


def _config_from_dict(d: dict):
    """Inverse of :func:`_config_dict`."""
    from icp_tpu.runtime.config import (
        Correspondence, ICPConfig, Objective, RobustKernel, RotationMode,
        Weighting,
    )

    enums = {"rotation": RotationMode, "weighting": Weighting,
             "correspondence": Correspondence, "objective": Objective,
             "robust": RobustKernel}
    kwargs = {}
    valid = {f.name for f in dataclasses.fields(ICPConfig)}
    for k, v in d.items():
        if k not in valid:
            continue  # forward compatibility: ignore unknown fields
        kwargs[k] = enums[k](v) if k in enums else v
    return ICPConfig(**kwargs)


def save_session(engine: SlamEngine, path: str,
                 backend: str = "npz") -> str:
    """Snapshot an engine.

    backend "npz": one compressed file (path gets .npz appended) — the
    simple durable default. backend "orbax": an orbax PyTree checkpoint
    directory — async-capable and multi-host-aware for pod-scale maps.
    """
    payload = _payload(engine)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        # Orbax rejects zero-size arrays; omit them and default at restore.
        payload = {k: v for k, v in payload.items()
                   if not (isinstance(v, np.ndarray) and v.size == 0)}
        path = os.path.abspath(path)
        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(path, payload, force=True)
        return path
    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp"
    np.savez_compressed(tmp, **payload)
    os.replace(tmp + ".npz" if os.path.exists(tmp + ".npz") else tmp, path)
    return path


def load_session(path: str, engine: Optional[SlamEngine] = None,
                 backend: str = "npz") -> SlamEngine:
    """Restore a SlamEngine from a snapshot. If ``engine`` is given, its
    params/config are kept and only the state is restored."""
    if backend == "orbax":
        import orbax.checkpoint as ocp

        data = ocp.PyTreeCheckpointer().restore(os.path.abspath(path))
    else:
        if not path.endswith(".npz"):
            path = path + ".npz"
        data = np.load(path, allow_pickle=False)
    version = int(np.asarray(data["version"]))
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported snapshot version {version}")

    meta = json.loads(bytes(np.asarray(data["meta"])).decode())
    if engine is None:
        # Reconstruct the engine with the SAVED configuration — algorithm
        # variant, thresholds, and policies, not just the shapes; a resumed
        # session must run the same algorithm that produced the snapshot.
        from icp_tpu.runtime.config import ICPConfig, ICPParams
        from icp_tpu.slam.mapping import LoopClosureConfig
        from icp_tpu.slam.odometry import KeyframePolicy

        if "config" in meta:
            config = _config_from_dict(meta["config"])
            engine = SlamEngine(
                params=ICPParams(**meta["params"]),
                config=config,
                policy=KeyframePolicy(**meta["policy"]),
                loop_config=LoopClosureConfig(**meta["loop_config"]),
                use_pyramid=bool(meta.get("use_pyramid", False)),
                pyramid_strides=tuple(meta.get("pyramid_strides",
                                               (4, 2, 1))),
            )
        else:  # legacy snapshot: shapes only, everything else defaulted
            import warnings

            warnings.warn(
                "legacy snapshot without full config: non-shape settings "
                "(objective, weighting, rotation mode, policies) are "
                "defaulted", stacklevel=2)
            engine = SlamEngine(config=ICPConfig(
                m=int(meta["m"]), n_r=int(meta["n_r"]),
                estimate_scale=False))
    eng = engine
    eng.trajectory = [
        se3.Pose(jnp.asarray(q), jnp.asarray(t))
        for q, t in zip(data["traj_q"], data["traj_t"])
    ]
    m = SlamMap()
    for idx, q, t, lms in zip(data["kf_index"], data["kf_q"], data["kf_t"],
                              data["kf_landmarks"]):
        m.keyframes.append(Keyframe(int(idx),
                                    se3.Pose(jnp.asarray(q), jnp.asarray(t)),
                                    jnp.asarray(lms)))
    def _get(key, shape, dtype):
        # Orbax snapshots omit zero-size arrays (see save_session).
        try:
            return np.asarray(data[key])
        except KeyError:
            return np.zeros(shape, dtype)

    m.edges = [tuple(e) for e in _get("edges", (0, 2), np.int32)]
    meas_q = _get("meas_q", (0, 4), np.float32)
    meas_t = _get("meas_t", (0, 3), np.float32)
    m.measurements = [
        se3.Pose(jnp.asarray(q), jnp.asarray(t))
        for q, t in zip(meas_q, meas_t)
    ]
    m.weights = list(_get("weights", (0,), np.float32).astype(float))
    m.loop_closures = [tuple(e) for e in _get("loop_closures", (0, 2),
                                              np.int32)]
    eng.map = m
    eng._rebuild_grid()  # loop-closure spatial index over restored poses
    eng._gap_since_kf = int(meta.get("gap_since_kf", 0))
    last = _get("last_lms", (0, 8), np.float32)
    if last.size:
        eng._prev_lms = jnp.asarray(last)
    elif m.keyframes:  # legacy snapshots without last_lms
        eng._prev_lms = m.keyframes[-1].landmarks
    return eng
