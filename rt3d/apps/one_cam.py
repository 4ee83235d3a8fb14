"""Single-camera live reconstruction CLI — the `1cam/rt-tracking.py`
analog: one stream, per-object clouds in the robot frame, periodic scene
export (PLY every 30 frames, like the reference's Open3D refresh at
`1cam/rt-tracking.py:267-285`), random-subsample preview clouds."""

from __future__ import annotations

import argparse
import os

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    from rt3d.apps.common import (
        add_common_args, adopt_source_calibration, load_config,
        load_model_params, maybe_quantize_params, open_source,
    )

    add_common_args(p)
    p.add_argument("--subsample", type=float, default=0.05,
                   help="preview cloud keep-fraction (reference uses 5%%)")
    args = p.parse_args()

    from rt3d.pipeline.step import build_pipeline
    from rt3d.runtime.driver import PipelineDriver

    cfg = load_config(args, num_cameras=1)
    src = open_source(args, 1, hw=(cfg.rig.cameras[0].intrinsics.height,
                                   cfg.rig.cameras[0].intrinsics.width))
    cfg = adopt_source_calibration(cfg, src)
    pipe = build_pipeline(cfg)
    params = load_model_params(pipe, cfg)
    params = maybe_quantize_params(pipe, params, src, args)
    os.makedirs(args.log_dir, exist_ok=True)
    spool = None
    if args.live:
        from rt3d.viz.live import LiveSpool

        # every-30 + 5% subsample mirror the reference's scene refresh
        # cadence (`1cam/rt-tracking.py:189,267-285`)
        spool = LiveSpool(args.live, every=30, subsample=args.subsample)
    driver = PipelineDriver(
        pipe, params, mode=args.mode, pipeline_depth=args.pipeline_depth,
        frames_per_dispatch=args.scan,
        fps_log_path=os.path.join(args.log_dir, "fps_log.csv"),
        timings_path=os.path.join(args.log_dir, "timings.csv"),
    )

    rng = np.random.default_rng(0)

    def on_frame(i, out):
        if spool is not None:
            spool.publish(i, out,
                          rgb_fn=lambda: np.asarray(src.get(i).rgb))
        if i % 30 != 0 or not args.save_ply:
            return
        from rt3d.viz.cloud import save_ply

        objs = out.per_camera_objects
        pts = np.asarray(objs.points[0])
        val = np.asarray(objs.valid[0]) & np.asarray(objs.present[0])[:, None]
        cloud = pts[val]
        if len(cloud):
            keep = rng.uniform(size=len(cloud)) < args.subsample
            sub = cloud[keep] if keep.any() else cloud
            save_ply(os.path.join(args.log_dir, f"objects_{i:05d}.ply"), sub)

    use_cb = args.save_ply or spool is not None
    res = driver.run(src, num_frames=args.frames, warmup=args.warmup,
                     on_frame=on_frame if use_cb else None)
    print(f"frames={res.frames} mean_fps={res.mean_fps:.2f} "
          f"median={res.median_fps:.2f} max={res.max_fps:.2f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
