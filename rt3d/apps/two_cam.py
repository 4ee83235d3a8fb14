"""Two-camera reconstruction pipeline CLI — the `2cam/2cams.py` /
`2cams_mask_gpu.py` analog: full detect -> track -> clouds -> fuse ->
subtract loop with CSV logging, optional PLY/frame dumps."""

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
    args = p.parse_args()

    from rt3d.pipeline.step import build_pipeline
    from rt3d.runtime.driver import PipelineDriver

    cfg = load_config(args, num_cameras=2)
    src = open_source(args, 2, hw=(cfg.rig.cameras[0].intrinsics.height,
                                   cfg.rig.cameras[0].intrinsics.width))
    cfg = adopt_source_calibration(cfg, src)
    pipe = build_pipeline(cfg)
    params = load_model_params(pipe, cfg)
    params = maybe_quantize_params(pipe, params, src, args)

    os.makedirs(args.log_dir, exist_ok=True)
    spool = None
    if args.live:
        from rt3d.viz.live import LiveSpool

        spool = LiveSpool(args.live, every=5, subsample=0.25)
    driver = PipelineDriver(
        pipe, params, mode=args.mode, pipeline_depth=args.pipeline_depth,
        frames_per_dispatch=args.scan,
        fps_log_path=os.path.join(args.log_dir, "fps_log.csv"),
        timings_path=os.path.join(args.log_dir, "timings.csv"),
    )

    def on_frame(i, out):
        if spool is not None:
            spool.publish(i, out,
                          rgb_fn=lambda: np.asarray(src.get(i).rgb))
        if args.save_ply and i % 30 == 0:
            from rt3d.viz.cloud import save_ply

            ws = np.asarray(out.workspace.points)[np.asarray(out.workspace.valid)]
            save_ply(os.path.join(args.log_dir, f"workspace_{i:05d}.ply"), ws)
            ob = np.asarray(out.objects_flat.points)[np.asarray(out.objects_flat.valid)]
            if len(ob):
                save_ply(os.path.join(args.log_dir, f"objects_{i:05d}.ply"), ob)
        if args.save_frames and i % 30 == 0:
            import cv2

            from rt3d.viz.draw import annotate_frame, side_by_side

            pkt = src.get(i)
            frames = []
            for c in range(2):
                frames.append(annotate_frame(
                    pkt.rgb[c],
                    np.asarray(out.detections.boxes[c]),
                    np.asarray(out.detections.scores[c]),
                    np.asarray(out.detections.classes[c]),
                    np.asarray(out.detections.valid[c]),
                    np.asarray(out.track_ids[c]),
                ))
            cv2.imwrite(os.path.join(args.log_dir, f"frame_{i:05d}.png"),
                        side_by_side(*frames))

    use_cb = args.save_ply or args.save_frames or spool is not None
    res = driver.run(src, num_frames=args.frames, warmup=args.warmup,
                     on_frame=on_frame if use_cb else None)
    print(f"frames={res.frames} mean_fps={res.mean_fps:.2f} "
          f"median={res.median_fps:.2f} max={res.max_fps:.2f}")
    for k, v in res.summary_ms.items():
        print(f"  {k}: {v:.2f} ms")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
