"""Side-by-side comparison of rt3d runs against reference CSV logs.

Both systems emit the same CSV schemas (`fps_log.csv`: Timestamp,FPS rows;
`timings.csv`: per-stage comma-joined seconds — reference writers at
`2cam/vision_pipeline_utils.py:345-355`), so one loader serves both. The
reference repo ships its captured RTX-4090 logs (`2cam/fps_log.csv`,
`2cam/timings.csv`), which are the baseline columns here.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np

from rt3d.viz.plots import _read_fps_log, read_timings

REFERENCE_LOG_DIR = "/root/reference/2cam"


@dataclass
class RunSummary:
    name: str
    fps_mean: float = float("nan")
    fps_median: float = float("nan")
    fps_max: float = float("nan")
    stage_ms: Dict[str, float] = field(default_factory=dict)


def load_run_summary(log_dir: str, name: str = "run",
                     drop_warmup: int = 1) -> RunSummary:
    out = RunSummary(name=name)
    fps_csv = os.path.join(log_dir, "fps_log.csv")
    tim_csv = os.path.join(log_dir, "timings.csv")
    # drop-warmup applies unconditionally: a run shorter than the warmup
    # window yields honest blank columns, never compile-ramp numbers
    if os.path.exists(fps_csv):
        _, fps = _read_fps_log(fps_csv)
        fps = fps[drop_warmup:]
        if len(fps):
            out.fps_mean = float(np.mean(fps))
            out.fps_median = float(np.median(fps))
            out.fps_max = float(np.max(fps))
    if os.path.exists(tim_csv):
        for stage, vals in read_timings(tim_csv).items():
            v = vals[drop_warmup:]
            if len(v):
                out.stage_ms[stage] = 1000.0 * float(np.mean(v))
    return out


def compare_runs(
    ours_dir: str,
    reference_dir: Optional[str] = None,
    ours_name: str = "rt3d (TPU v5e)",
    ref_name: str = "reference (RTX 4090)",
    drop_warmup: int = 1,
) -> str:
    """Formatted comparison table. Missing files degrade to blank columns.

    ``drop_warmup`` frames are dropped from OUR logs only (jit compilation
    lands in the first frames; the reference loads its model before its
    loop, so its warmup is its frame 1)."""
    ref_dir = reference_dir or REFERENCE_LOG_DIR
    ours = load_run_summary(ours_dir, ours_name, drop_warmup=drop_warmup)
    ref = load_run_summary(ref_dir, ref_name)

    rows = []
    rows.append(f"{'metric':34s} {ours.name:>18s} {ref.name:>22s}   ratio")
    rows.append("-" * 84)

    def fmt(v):
        return f"{v:18.2f}" if np.isfinite(v) else " " * 17 + "-"

    for label, a, b in [
        ("FPS mean", ours.fps_mean, ref.fps_mean),
        ("FPS median", ours.fps_median, ref.fps_median),
        ("FPS max", ours.fps_max, ref.fps_max),
    ]:
        ratio = a / b if np.isfinite(a) and np.isfinite(b) and b else float("nan")
        rows.append(
            f"{label:34s} {fmt(a)} {fmt(b):>22s}   "
            + (f"{ratio:.2f}x" if np.isfinite(ratio) else "-")
        )
    stages = sorted(set(ours.stage_ms) | set(ref.stage_ms))
    for s in stages:
        a = ours.stage_ms.get(s, float("nan"))
        b = ref.stage_ms.get(s, float("nan"))
        ratio = b / a if np.isfinite(a) and np.isfinite(b) and a else float("nan")
        rows.append(
            f"{s + ' (ms)':34s} {fmt(a)} {fmt(b):>22s}   "
            + (f"{ratio:.2f}x faster" if np.isfinite(ratio) else "-")
        )
    return "\n".join(rows)


def main() -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--ours", default="runs", help="rt3d run log dir")
    p.add_argument("--reference", default=None,
                   help=f"reference log dir (default {REFERENCE_LOG_DIR})")
    p.add_argument("--drop-warmup", type=int, default=1,
                   help="frames dropped from OUR logs (compile ramp)")
    args = p.parse_args()
    print(compare_runs(args.ours, args.reference, drop_warmup=args.drop_warmup))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
