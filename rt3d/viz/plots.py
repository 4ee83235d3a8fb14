"""Offline analysis plots over the CSV logs.

Functional equivalents of the reference's `2cam/visualizer_fps.py`
(smoothed FPS curve, 30 s window, Savitzky-Golay window 15 / order 2, avg
line + max annotation) and `2cam/visualizer_performance.py` (per-stage mean
ms bar chart with value labels). Reads the same CSV schemas either system
writes.
"""

from __future__ import annotations

import csv
from typing import Dict, List, Optional

import numpy as np


def _read_fps_log(path: str):
    ts, fps = [], []
    with open(path) as f:
        r = csv.reader(f)
        next(r, None)  # header
        for row in r:
            if len(row) >= 2:
                ts.append(float(row[0]))
                fps.append(float(row[1]))
    return np.asarray(ts), np.asarray(fps)


def read_timings(path: str) -> Dict[str, np.ndarray]:
    out = {}
    with open(path) as f:
        r = csv.reader(f)
        next(r, None)
        for row in r:
            if len(row) >= 2 and row[1]:
                out[row[0]] = np.asarray([float(v) for v in row[1].split(",")])
    return out


def plot_fps(
    fps_log_path: str, out_path: str, window_s: float = 30.0,
    smooth_window: int = 15, smooth_order: int = 2,
) -> Optional[str]:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    ts, fps = _read_fps_log(fps_log_path)
    if len(fps) == 0:
        return None
    t = ts - ts[0]
    sel = t <= window_s
    t, fps = t[sel], fps[sel]
    smoothed = fps
    if len(fps) > smooth_window:
        try:
            from scipy.signal import savgol_filter

            smoothed = savgol_filter(fps, smooth_window, smooth_order)
        except Exception:
            k = np.ones(5) / 5
            smoothed = np.convolve(fps, k, mode="same")
    fig, ax = plt.subplots(figsize=(10, 5))
    ax.plot(t, smoothed, label="FPS (smoothed)", lw=2)
    avg = float(np.mean(fps))
    ax.axhline(avg, ls="--", c="tab:orange", label=f"avg {avg:.2f}")
    imax = int(np.argmax(smoothed))
    ax.annotate(f"max {smoothed[imax]:.2f}", (t[imax], smoothed[imax]),
                textcoords="offset points", xytext=(5, 5))
    ax.set_xlabel("time (s)")
    ax.set_ylabel("FPS")
    ax.set_title("End-to-end FPS over time")
    ax.legend()
    fig.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out_path


def plot_stage_timings(timings_path: str, out_path: str) -> Optional[str]:
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    data = read_timings(timings_path)
    if not data:
        return None
    names, means = [], []
    for k, v in data.items():
        names.append(k)
        means.append(1000.0 * float(np.mean(v[1:] if len(v) > 1 else v)))
    fig, ax = plt.subplots(figsize=(11, 5))
    bars = ax.bar(range(len(names)), means, color="tab:blue")
    for b, m in zip(bars, means):
        ax.text(b.get_x() + b.get_width() / 2, m, f"{m:.1f}", ha="center",
                va="bottom", fontsize=8)
    ax.set_xticks(range(len(names)))
    ax.set_xticklabels(names, rotation=20, ha="right", fontsize=8)
    ax.set_ylabel("mean ms / frame")
    ax.set_title("Average timing per pipeline stage")
    fig.savefig(out_path, dpi=200, bbox_inches="tight")
    plt.close(fig)
    return out_path
