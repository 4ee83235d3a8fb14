"""Precompute int8 activation scales for a weights artifact.

Writes `<weights>.act_scales.json` next to the .npz — the sidecar
`bench.py` (RT3D_BENCH_QUANT=1) and the apps (`--quantize`) auto-load so
deploy targets skip the calibration stats-forward compile (minutes on
the dev relay for yolo11x).

Calibrates on the bench's own synthetic 2-camera HD720 scenes through
the pipeline's preprocessing — the distribution the benched conv stack
actually sees. Runs on whatever backend is active (scales are max-|x|
envelopes; bf16 rounding differences between backends are noise).

    PYTHONPATH=. python tools/calibrate_quant.py weights/yolo11x_synth_seg.npz
"""

import argparse
import dataclasses
import json
import os
import sys


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("weights", help="trained .npz artifact")
    p.add_argument("--frames", type=int, default=6,
                   help="calibration frame count")
    p.add_argument("--out", default=None,
                   help="output JSON (default: <weights>.act_scales.json)")
    p.add_argument("--pct", type=float, default=None,
                   help="calibrate to this percentile of |x| per frame "
                        "instead of the max (e.g. 99.9); outlier-robust "
                        "scales — compare accuracy with "
                        "tools/eval_quant_chip.py before shipping")
    args = p.parse_args()

    import jax.numpy as jnp

    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.models.yolo import quant
    from rt3d.models.yolo.convert import load_params
    from rt3d.pipeline.step import build_pipeline

    manifest_path = os.path.splitext(args.weights)[0] + ".json"
    with open(manifest_path) as f:
        manifest = json.load(f)

    cfg = reference_2cam_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            variant=manifest["variant"],
            input_hw=tuple(manifest["input_hw"]),
        ),
    )
    # calibrate across scene densities (1 and 2 objects): a max-|x|
    # envelope from single-object scenes alone clips on busier frames,
    # which shows up as spurious near-threshold duplicate detections
    srcs = [
        SyntheticSource(num_cameras=2, num_frames=None, hw=(720, 1280),
                        num_objects=n, seed=s)
        for n, s in ((1, 0), (2, 7))
    ]
    cfg = with_cameras(cfg, srcs[0].cameras())
    pipe = build_pipeline(cfg)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in load_params(args.weights).items()}

    frames = tuple(range(0, 4 * args.frames, 4))
    batches = [b for s in srcs
               for b in quant.synth_calib_batches(pipe, s, frames=frames)]
    scales = quant.collect_act_scales(pipe.model, params, batches,
                                      pct=args.pct)

    out = args.out or quant.sidecar_path(args.weights)
    calibration = ({"mode": "pct", "pct": args.pct} if args.pct
                   else {"mode": "max"})
    calibration["frames"] = len(batches)
    quant.save_act_scales(out, scales, weights_path=args.weights,
                          calibration=calibration)
    print(f"wrote {len(scales)} act scales -> {out}")
    return 0


if __name__ == "__main__":
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.exit(main())
