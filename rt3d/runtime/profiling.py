"""Device-level profiling: trace capture + per-op aggregation.

The TPU analog of the reference's wall-clock stage spans
(`2cams_mask_gpu.py:31-41`): since rt3d fuses stages into one XLA program,
stage attribution comes from the device trace. `profile_op_times` runs a
callable under `jax.profiler.trace`, parses the perfetto JSON the TPU
runtime emits, and returns {hlo_op: ms} — the tool that found every
hotspot fixed in this codebase (sorts, scatters, searchsorted-whiles).
"""

from __future__ import annotations

import glob
import gzip
import json
import shutil
import tempfile
from collections import defaultdict
from typing import Callable, Dict, Optional, Tuple

import jax


def profile_op_times(
    fn: Callable[[], object],
    iters: int = 5,
    trace_dir: Optional[str] = None,
) -> Tuple[float, Dict[str, float]]:
    """Run `fn` `iters` times under the profiler.

    Returns (total_ms_per_iter, {op_name: ms_per_iter}). `fn` must block on
    its result (call `jax.block_until_ready` inside or return arrays the
    caller blocks on — this helper blocks on the return value).
    """
    jax.block_until_ready(fn())  # compile outside the trace
    d = trace_dir or tempfile.mkdtemp(prefix="rt3d_trace_")
    with jax.profiler.trace(d):
        out = None
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)

    files = sorted(glob.glob(d + "/**/*.trace.json.gz", recursive=True))
    if not files:
        return float("nan"), {}
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    agg: Dict[str, float] = defaultdict(float)
    total = 0.0
    for e in data.get("traceEvents", []):
        nm = e.get("name", "")
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        if nm.startswith("jit_"):
            total += e["dur"]
        elif not nm.startswith("$") and "Pjit" not in nm:
            agg[nm] += e["dur"]
    if trace_dir is None:
        shutil.rmtree(d, ignore_errors=True)
    per_op = {k: v / 1000.0 / iters for k, v in agg.items()}
    return total / 1000.0 / iters, per_op


def format_op_times(total_ms: float, per_op: Dict[str, float],
                    top: int = 20, min_ms: float = 0.05) -> str:
    rows = [f"device total: {total_ms:.2f} ms/iter", "top ops:"]
    for name, ms in sorted(per_op.items(), key=lambda kv: -kv[1])[:top]:
        if ms < min_ms:
            break
        rows.append(f"  {ms:8.3f} ms  {name[:70]}")
    return "\n".join(rows)
