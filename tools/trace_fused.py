"""Op-level profiler-trace breakdown of the fused pipeline step on TPU."""

import glob
import gzip
import json
import os
import shutil
import sys
import tempfile
from collections import defaultdict

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.config import reference_2cam_config
from rt3d.io.synthetic import SyntheticSource
from rt3d.pipeline.step import CameraCalib, build_pipeline


def main():
    import dataclasses

    variant = os.environ.get("RT3D_DEMO_VARIANT", "n")
    cfg = reference_2cam_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, variant=variant))
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(720, 1280), num_objects=1)
    pkt = src.get(0)
    rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)

    step = jax.jit(pipe.step)
    state = pipe.init_state()
    state, out = step(params, state, rgb, depth, calib)
    jax.block_until_ready(out.workspace.valid)

    n = 5
    d = tempfile.mkdtemp()
    with jax.profiler.trace(d):
        for _ in range(n):
            state, out = step(params, state, rgb, depth, calib)
        jax.block_until_ready(out.workspace.valid)

    files = glob.glob(d + "/**/*.trace.json.gz", recursive=True)
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    agg = defaultdict(float)
    total = 0.0
    for e in data.get("traceEvents", []):
        nm = e.get("name", "")
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        if nm.startswith("jit_step"):
            total += e["dur"]
        elif not nm.startswith("$") and "Pjit" not in nm and "jit_" not in nm:
            agg[nm[:64]] += e["dur"]
    print(f"fused step device time: {total/1000/n:.2f} ms/frame (variant {variant})")
    print("top ops:")
    shown = 0.0
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        ms = dur / 1000 / n
        if ms < 0.05:
            break
        shown += ms
        print(f"  {ms:8.3f} ms  {name}")
    print(f"  (shown {shown:.2f} ms)")
    shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
