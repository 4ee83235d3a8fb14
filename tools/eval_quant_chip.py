"""fp-vs-int8 detection accuracy for a trained weights artifact, on the
active backend (the point: run it on the REAL TPU chip, where int8
grouped-conv support and bf16/int8 numerics can differ from the CPU
backend the accuracy gate in `tests/test_quant.py` runs on).

Prints one JSON line:
  {"variant": ..., "fp": {recall, mean_iou, ...},
   "int8": {recall, mean_iou, ...}, "grouped_excluded": bool}

    PYTHONPATH=. python tools/eval_quant_chip.py weights/yolo11x_synth_seg.npz

`--skip-fp` evaluates only the int8 path (fp numbers for the same
artifact/seed are already recorded in NOTES.md). If the int8 compile
fails on grouped convs, re-run with RT3D_QUANT_NO_GROUPED=1 — the JSON
records which mode produced the numbers.
"""

import argparse
import dataclasses
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("weights", help="trained .npz artifact")
    p.add_argument("--frames", type=int, default=6)
    p.add_argument("--skip-fp", action="store_true")
    p.add_argument("--skip-int8", action="store_true")
    p.add_argument("--scales", default=None,
                   help="act-scales JSON to use instead of the default "
                        "sidecar (e.g. a --pct calibration)")
    p.add_argument("--mask-bf16", action="store_true",
                   help="evaluate with the bf16 retina-mask upsample "
                        "(ModelConfig.mask_resize_dtype) — the accuracy "
                        "gate for flipping the bench default")
    p.add_argument("--preproc-bf16", action="store_true",
                   help="evaluate with the bf16 letterbox preprocess "
                        "(ModelConfig.preprocess_dtype)")
    args = p.parse_args()

    import jax.numpy as jnp

    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.models.yolo import quant
    from rt3d.models.yolo.convert import load_params
    from rt3d.pipeline.step import build_pipeline
    from tools.eval_synth import evaluate_weights

    with open(os.path.splitext(args.weights)[0] + ".json") as f:
        manifest = json.load(f)
    variant = manifest["variant"]
    input_hw = tuple(manifest["input_hw"])

    cfg = reference_2cam_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model, variant=variant, input_hw=input_hw, conf_thresh=0.25,
            mask_resize_dtype="bfloat16" if args.mask_bf16 else "float32",
            preprocess_dtype="bfloat16" if args.preproc_bf16 else "float32",
        ),
    )
    # evaluate_weights' own default scene geometry (seed 777, 1 object for
    # the camera rig) so the numbers are comparable with NOTES.md rows
    src0 = SyntheticSource(num_cameras=2, num_frames=None, hw=(720, 1280),
                           num_objects=1, seed=777)
    cfg = with_cameras(cfg, src0.cameras())
    pipe = build_pipeline(cfg)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in load_params(args.weights).items()}

    record = {
        "variant": variant,
        "weights": os.path.basename(args.weights),
        "frames": args.frames,
        "grouped_excluded": bool(os.environ.get("RT3D_QUANT_NO_GROUPED")),
        "mask_bf16": args.mask_bf16,
        "preproc_bf16": args.preproc_bf16,
    }
    if not args.skip_fp:
        record["fp"] = evaluate_weights(
            params, variant=variant, input_hw=input_hw,
            num_frames=args.frames, pipe=pipe)
    if not args.skip_int8:
        sidecar = args.scales or quant.sidecar_path(args.weights)
        scales = quant.load_act_scales(sidecar, weights_path=args.weights) \
            if os.path.exists(sidecar) else None
        record["scales"] = os.path.basename(sidecar) if scales else "calibrated"
        if scales is None:
            print(f"# no sidecar at {sidecar}; calibrating", file=sys.stderr)
            src = SyntheticSource(num_cameras=2, num_frames=None,
                                  hw=(720, 1280), num_objects=2, seed=4242)
            qparams = quant.quantize_params(
                pipe.model, params, quant.synth_calib_batches(pipe, src))
        else:
            qparams = quant.quantize_params(
                pipe.model, params, (), act_scales=scales)
        record["int8"] = evaluate_weights(
            qparams, variant=variant, input_hw=input_hw,
            num_frames=args.frames, pipe=pipe)
    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
