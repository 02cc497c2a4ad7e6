"""Matplotlib-based offline cloud / trajectory rendering.

Import of matplotlib is deferred and failures are soft (viz is never on the
hot path; bare environments without a display stack still run the engine).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import os

    import matplotlib

    # Headless (every pod): force Agg. With a display or an explicit
    # backend choice, leave it interactive for viz.live.LiveViewer.
    if not os.environ.get("DISPLAY") and not os.environ.get("MPLBACKEND"):
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def plot_cloud(cloud8: np.ndarray, path: str, max_points: int = 20000,
               title: Optional[str] = None) -> None:
    """Scatter an (n, 8) cloud colored by its photometric half."""
    plt = _plt()
    pts = np.asarray(cloud8)
    pts = pts[np.abs(pts[:, :3]).sum(1) > 0]
    if len(pts) > max_points:
        idx = np.random.default_rng(0).choice(len(pts), max_points, False)
        pts = pts[idx]
    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(pts[:, 0], pts[:, 2], -pts[:, 1], s=1,
               c=np.clip(pts[:, 4:7], 0, 1))
    ax.set_xlabel("x [mm]")
    ax.set_ylabel("z [mm]")
    ax.set_zlabel("-y [mm]")
    if title:
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_registration(fixed8: np.ndarray, moving8: np.ndarray,
                      transformed8: np.ndarray, path: str,
                      max_points: int = 8000) -> None:
    """Before/after composite: fixed (gray) vs moving (red) vs registered
    moving (green)."""
    plt = _plt()
    rng = np.random.default_rng(0)

    def sub(c):
        c = np.asarray(c)
        c = c[np.abs(c[:, :3]).sum(1) > 0]
        if len(c) > max_points:
            c = c[rng.choice(len(c), max_points, False)]
        return c

    f, m, t = sub(fixed8), sub(moving8), sub(transformed8)
    fig, axes = plt.subplots(1, 2, figsize=(13, 6),
                             subplot_kw={"projection": "3d"})
    for ax, other, label, color in [(axes[0], m, "before", "#d62728"),
                                    (axes[1], t, "after", "#2ca02c")]:
        ax.scatter(f[:, 0], f[:, 2], -f[:, 1], s=1, c="#888888", label="fixed")
        ax.scatter(other[:, 0], other[:, 2], -other[:, 1], s=1, c=color,
                   label=label)
        ax.legend()
        ax.set_title(label)
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def plot_trajectory(est_t: Sequence[np.ndarray],
                    gt_t: Optional[Sequence[np.ndarray]], path: str) -> None:
    """Top-down (x-z) trajectory plot, estimated vs ground truth."""
    plt = _plt()
    e = np.asarray([np.asarray(t) for t in est_t])
    fig, ax = plt.subplots(figsize=(7, 6))
    ax.plot(e[:, 0], e[:, 2], "o-", label="estimated", ms=3)
    if gt_t is not None:
        g = np.asarray([np.asarray(t) for t in gt_t])
        ax.plot(g[:, 0], g[:, 2], "x--", label="ground truth", ms=4)
    ax.set_xlabel("x [mm]")
    ax.set_ylabel("z [mm]")
    ax.axis("equal")
    ax.legend()
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)
