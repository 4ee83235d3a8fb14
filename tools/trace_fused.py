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
    cams = int(os.environ.get("RT3D_TRACE_CAMS", "2"))
    cfg = reference_2cam_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, variant=variant))
    # RT3D_TRACE_VOXEL_MM=1 profiles the stretch voxel size with the same
    # capacity rescale bench.py applies
    voxel_mm = float(os.environ.get("RT3D_TRACE_VOXEL_MM", "5"))
    if voxel_mm != 5.0:
        cfg = dataclasses.replace(
            cfg,
            pipeline=dataclasses.replace(
                cfg.pipeline,
                voxel_size=voxel_mm / 1000.0,
                max_points_workspace=262144,
                max_points_workspace_fused=262144 * cams,
                max_union_voxels=65536,
                max_points_per_object=8192,
                max_points_fused_object=16384,
                max_points_fused_flat=32768,
            ),
        )
    # RT3D_TRACE_ACCUM=1: profile the persistent-accumulation step (the
    # BASELINE stretch config pairs it with CAMS=4 VOXEL_MM=1)
    if os.environ.get("RT3D_TRACE_ACCUM"):
        cfg = dataclasses.replace(
            cfg,
            pipeline=dataclasses.replace(
                cfg.pipeline,
                workspace_accumulate=True,
                accum_capacity=cfg.pipeline.max_points_workspace_fused,
            ),
        )
    # RT3D_TRACE_TRACKER=botsort|deepsort mirrors bench.py's tracker rows
    # so the tracker tax (VERDICT r4 weak #5) is attributable by source line
    tracker = os.environ.get("RT3D_TRACE_TRACKER")
    if tracker == "botsort":
        cfg = dataclasses.replace(
            cfg, tracker=dataclasses.replace(
                cfg.tracker, tracker_type="botsort", with_reid=True,
                gmc=True))
    elif tracker == "deepsort":
        cfg = dataclasses.replace(
            cfg, tracker=dataclasses.replace(
                cfg.tracker, tracker_type="deepsort", with_reid=True))
    src = SyntheticSource(num_cameras=cams, num_frames=2, hw=(720, 1280),
                          num_objects=int(os.environ.get("RT3D_TRACE_OBJECTS", "1")))
    from rt3d.config import with_cameras

    cfg = with_cameras(cfg, src.cameras())
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    # RT3D_TRACE_TRAINED=1: profile with the trained artifact so the
    # detection-dependent stages (fusion SOR, per-object dedupe) run the
    # real workload instead of the zero-detection fast path
    wpath = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         "weights", f"yolo11{variant}_synth_seg.npz")
    if os.environ.get("RT3D_TRACE_TRAINED") and os.path.exists(wpath):
        from rt3d.models.yolo.convert import load_params

        params = {k: jnp.asarray(v, jnp.float32)
                  for k, v in load_params(wpath).items()}
        print(f"trained weights: {wpath}")
        # RT3D_TRACE_QUANT=1: profile the int8 conv stack (sidecar scales
        # skip the calibration compile, matching bench.py's quant leg)
        if os.environ.get("RT3D_TRACE_QUANT"):
            from rt3d.models.yolo import quant

            sidecar = quant.sidecar_path(wpath)
            scales = (quant.load_act_scales(sidecar, weights_path=wpath)
                      if os.path.exists(sidecar) else None)
            # src only holds 2 frames here — enough for a trace-run
            # fallback calibration when the sidecar is missing
            calib_imgs = (() if scales
                          else quant.synth_calib_batches(pipe, src,
                                                         frames=(0, 1)))
            params = quant.quantize_params(pipe.model, params, calib_imgs,
                                           act_scales=scales)
            print(f"int8 conv stack (scales: "
                  f"{'sidecar' if scales else 'calibrated'})")
    calib = CameraCalib.from_config(cfg)
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
    by_source = defaultdict(float)
    meta = {}
    total = 0.0
    for e in data.get("traceEvents", []):
        nm = e.get("name", "")
        if e.get("ph") != "X" or e.get("dur", 0) <= 0:
            continue
        if nm.startswith("jit_step"):
            total += e["dur"]
        elif not nm.startswith("$") and "Pjit" not in nm and "jit_" not in nm:
            agg[nm[:64]] += e["dur"]
            if nm[:64] not in meta and e.get("args"):
                meta[nm[:64]] = e["args"]
            src = (e.get("args") or {}).get("source", "?")
            by_source[src] += e["dur"]
    print(f"fused step device time: {total/1000/n:.2f} ms/frame (variant {variant})")
    groups = defaultdict(float)
    for name, dur in agg.items():
        for pre in ("convolution", "fusion", "sort", "while", "copy",
                    "cond", "dynamic", "scatter", "gather", "reduce",
                    "dot", "transpose", "select", "iota", "broadcast",
                    "multiply", "add", "and", "or_", "step", "Parse"):
            if name.startswith(pre):
                key = pre
                break
        else:
            key = name.split(".")[0][:24]
        groups[key] += dur
    print("by group:")
    for g, dur in sorted(groups.items(), key=lambda kv: -kv[1])[:14]:
        print(f"  {dur/1000/n:8.3f} ms  {g}")
    print("by source line (op cost attributed to the jaxpr source):")
    for src, dur in sorted(by_source.items(), key=lambda kv: -kv[1])[:22]:
        ms = dur / 1000 / n
        if ms < 0.05:
            break
        print(f"  {ms:8.3f} ms  {src.replace('/root/repo/', '')}")
    print("top ops:")
    shown = 0.0
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        ms = dur / 1000 / n
        if ms < 0.05:
            break
        shown += ms
        print(f"  {ms:8.3f} ms  {name}")
    print(f"  (shown {shown:.2f} ms)")
    focus = os.environ.get("RT3D_TRACE_FOCUS")
    if focus:
        for pre in focus.split(","):
            print(f"top '{pre}' ops:")
            for name, dur in sorted(agg.items(), key=lambda kv: -kv[1]):
                if not name.startswith(pre):
                    continue
                ms = dur / 1000 / n
                if ms < 0.02:
                    break
                print(f"  {ms:8.3f} ms  {name}  {meta.get(name, '')}")
    # RT3D_TRACE_HLO=1: cross-reference the top trace ops against the
    # compiled HLO's per-instruction metadata. The profiler's "source" arg
    # is often missing for multi-op fusions (shown as "?" above); the HLO
    # text records op_name/source_file for the fusion root AND every fused
    # instruction, so this recovers where an anonymous `fusion.179` came
    # from.
    if os.environ.get("RT3D_TRACE_HLO"):
        import re

        hlo = (jax.jit(pipe.step)
               .lower(params, pipe.init_state(), rgb, depth, calib)
               .compile().as_text())
        # instruction name -> (metadata op_name/source, calls=computation)
        inst_re = re.compile(
            r"%?([\w.\-]+)\s*=\s*\S+\s+(\w[\w\-]*)\(.*?"
            r"(?:calls=%?([\w.\-]+))?[^\n]*?"
            r"(?:metadata=\{([^}]*)\})?\s*$")
        comp_insts = defaultdict(list)  # computation -> [metadata strs]
        inst_info = {}
        cur_comp = None
        for line in hlo.splitlines():
            m = re.match(r"\s*%?([\w.\-]+)\s+\([^)]*\)\s*->", line)
            if line and not line.startswith(" ") and "{" in line:
                mc = re.match(r"(?:ENTRY\s+)?%?([\w.\-]+)", line.strip())
                cur_comp = mc.group(1) if mc else cur_comp
                continue
            mm = re.search(r"%?([\w.\-]+)\s*=.*?metadata=\{([^}]*)\}", line)
            calls = re.search(r"calls=%?([\w.\-]+)", line)
            if mm:
                nm2, md = mm.group(1), mm.group(2)
                inst_info[nm2] = (md, calls.group(1) if calls else None)
                if cur_comp:
                    comp_insts[cur_comp].append(md)
            elif calls:
                nm2 = re.match(r"\s*%?([\w.\-]+)\s*=", line)
                if nm2:
                    inst_info[nm2.group(1)] = ("", calls.group(1))

        def _srcs(md_list):
            out = defaultdict(int)
            for md in md_list:
                sf = re.search(r'source_file="([^"]*)"', md)
                sl = re.search(r"source_line=(\d+)", md)
                op = re.search(r'op_name="([^"]*)"', md)
                key = (f"{sf.group(1).split('/')[-1]}:{sl.group(1)}"
                       if sf and sl else (op.group(1)[-60:] if op else "?"))
                out[key] += 1
            return sorted(out.items(), key=lambda kv: -kv[1])[:6]

        print("HLO cross-reference of top ops:")
        for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:16]:
            ms = dur / 1000 / n
            if ms < 0.05:
                break
            info = inst_info.get(name)
            if info is None:
                print(f"  {ms:8.3f} ms  {name}  (not in HLO text)")
                continue
            md, callee = info
            srcs = _srcs(comp_insts.get(callee, [md] if md else []))
            print(f"  {ms:8.3f} ms  {name}  "
                  + "; ".join(f"{k} x{c}" for k, c in srcs))
    shutil.rmtree(d, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
