"""Shared test helpers."""

from __future__ import annotations

import numpy as np

FLOAT_EPS = np.finfo(np.float32).eps


def make_cloud8(rng: np.random.Generator, n: int) -> np.ndarray:
    """Kinect-like 8-D points: xyz in mm (z ~ 1-2 m), rgb in [0, 1)."""
    xyz = np.stack(
        [
            rng.uniform(-500, 500, n),
            rng.uniform(-400, 400, n),
            rng.uniform(1000, 2000, n),
        ],
        axis=1,
    )
    rgb = rng.uniform(0, 1, (n, 3))
    out = np.ones((n, 8), np.float32)
    out[:, :3] = xyz
    out[:, 4:7] = rgb
    return out


def random_quat(rng: np.random.Generator, max_angle_rad: float) -> np.ndarray:
    """Random unit quaternion [x, y, z, w] with angle <= max_angle_rad."""
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    ang = rng.uniform(0, max_angle_rad)
    return np.concatenate(
        [np.sin(ang / 2) * axis, [np.cos(ang / 2)]]
    ).astype(np.float32)
