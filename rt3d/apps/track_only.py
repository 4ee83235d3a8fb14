"""Detection + tracking demo CLI — the `1cam/yolo11_tracking.py` analog:
no clouds, per-box centre-depth lookup overlay
(`1cam/yolo11_tracking.py:89-111`)."""

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

    import jax
    import jax.numpy as jnp

    from rt3d.pipeline.step import build_pipeline

    cfg = load_config(args, num_cameras=1)
    src = open_source(args, 1, hw=(cfg.rig.cameras[0].intrinsics.height,
                                   cfg.rig.cameras[0].intrinsics.width))
    cfg = adopt_source_calibration(cfg, src)
    pipe = build_pipeline(cfg)
    params = load_model_params(pipe, cfg)
    params = maybe_quantize_params(pipe, params, src, args)
    os.makedirs(args.log_dir, exist_ok=True)

    @jax.jit
    def det_track(params, state, rgb):
        images = pipe.preprocess(rgb)
        det, protos, emb = pipe.detect(params, images)
        state, ids = pipe.track(state, det, det_emb=emb, images=images)
        return state, det, ids

    state = pipe.init_state()
    import time

    spool = None
    if args.live:
        from rt3d.viz.live import LiveSpool

        spool = LiveSpool(args.live, every=5)

    for i in range(args.frames):
        t0 = time.perf_counter()
        pkt = src.get(i)
        state, det, ids = det_track(params, state, jnp.asarray(pkt.rgb))
        jax.block_until_ready(ids)
        dt = time.perf_counter() - t0
        boxes = np.asarray(det.boxes[0])
        valid = np.asarray(det.valid[0])
        for k in range(len(boxes)):
            if valid[k]:
                cx = int((boxes[k, 0] + boxes[k, 2]) / 2)
                cy = int((boxes[k, 1] + boxes[k, 3]) / 2)
                h, w = pkt.depth[0].shape
                z = pkt.depth[0][min(max(cy, 0), h - 1), min(max(cx, 0), w - 1)]
                print(f"frame {i}: id={int(ids[0][k])} cls={int(det.classes[0][k])} "
                      f"conf={float(det.scores[0][k]):.2f} depth@centre={z:.2f} m")
        if i % 30 == 0:
            print(f"frame {i}: {1.0/max(dt,1e-9):.1f} FPS")
        img_cache = []

        def make_img():
            if not img_cache:
                from rt3d.viz.draw import annotate_frame

                img_cache.append(annotate_frame(
                    pkt.rgb[0], boxes, np.asarray(det.scores[0]),
                    np.asarray(det.classes[0]), valid, np.asarray(ids[0]),
                    fps=1.0 / max(dt, 1e-9),
                ))
            return img_cache[0]

        if spool is not None:
            spool.publish_frame(i, panel_fn=make_img,
                                detections=int(valid.sum()))
        if args.save_frames and i % 30 == 0:
            import cv2

            cv2.imwrite(
                os.path.join(args.log_dir, f"track_{i:05d}.png"), make_img())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
