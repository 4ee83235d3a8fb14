"""Shared CLI plumbing for the app entry points."""

from __future__ import annotations

import argparse
import dataclasses
import os
from typing import Optional, Tuple

import jax

from rt3d.config import Config, reference_2cam_config

# Persistent compile cache for every CLI app (bench.py already does this):
# on the dev relay the first full-pipeline compile is minutes; cached
# repeats are seconds. Scoped per backend so CPU test artifacts and
# TPU AOT artifacts never mix (different machine profiles).
if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    _backend = os.environ.get("JAX_PLATFORMS", "tpu").split(",")[0] or "tpu"
    jax.config.update(
        "jax_compilation_cache_dir",
        "/tmp/rt3d_jax_cache_tpu" if _backend not in ("cpu",)
        else "/tmp/rt3d_jax_cache_cpu",
    )
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)


def add_common_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--source", default="synthetic",
                   help=".rts sequence path, or 'synthetic'")
    p.add_argument("--frames", type=int, default=100)
    p.add_argument("--variant", default=None, choices=["n", "s", "m", "l", "x"],
                   help="YOLO11 scale")
    p.add_argument("--weights", default=None, help="converted .npz or raw .pt")
    p.add_argument("--config", default=None, help="JSON config path")
    p.add_argument("--mode", default="fused", choices=["fused", "profile"])
    p.add_argument("--pipeline-depth", type=int, default=2,
                   help="frames in flight (1 = fully synchronous)")
    p.add_argument("--scan", type=int, default=1,
                   help="frames per dispatch (throughput mode; adds "
                        "scan-1 frames of latency)")
    p.add_argument("--warmup", type=int, default=5,
                   help="frames excluded from the measured FPS window")
    p.add_argument("--log-dir", default="runs")
    p.add_argument("--save-ply", action="store_true",
                   help="dump workspace/object clouds as PLY every 30 frames")
    p.add_argument("--save-frames", action="store_true",
                   help="write annotated frames as PNGs")
    p.add_argument("--live", default=None, metavar="SPOOL_DIR",
                   help="publish latest outputs for `rt3d.apps.viewer`")
    p.add_argument("--accumulate", action="store_true",
                   help="persistent TSDF-style workspace accumulation: the "
                        "published workspace cloud is a decaying weighted "
                        "voxel set instead of a per-frame rebuild")
    p.add_argument("--accum-raw", action="store_true",
                   help="with --accumulate: feed raw workspace rays to the "
                        "accumulator and let its merge do the (single, "
                        "global) voxel dedupe — skips the per-camera dedupe "
                        "sorts; voxel weights count ray support")
    p.add_argument("--tracker", default=None,
                   choices=["bytetrack", "botsort", "deepsort"],
                   help="ID association: bytetrack (reference default), "
                        "botsort (ReID-fused IoU + GMC), deepsort "
                        "(appearance-primary under a Mahalanobis gate)")
    p.add_argument("--quantize", action="store_true",
                   help="run the conv stack int8 (W8A8, per-channel "
                        "weights): calibrates activation ranges on the "
                        "source's first frames, then the MXU runs s8xs8 at "
                        "2x the bf16 rate (accuracy bar: tests/test_quant)")


def load_config(args, num_cameras: Optional[int] = None) -> Config:
    cfg = Config.from_json(args.config) if args.config else reference_2cam_config()
    if args.variant:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, variant=args.variant)
        )
    if args.weights:
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(cfg.model, weights=args.weights)
        )
    if getattr(args, "tracker", None):
        t = args.tracker
        cfg = dataclasses.replace(
            cfg, tracker=dataclasses.replace(
                cfg.tracker, tracker_type=t,
                # botsort's yaml enables ReID+GMC; deepsort implies ReID
                with_reid=t in ("botsort", "deepsort") or cfg.tracker.with_reid,
                gmc=(t == "botsort") or cfg.tracker.gmc,
            )
        )
    if getattr(args, "accumulate", False):
        cfg = dataclasses.replace(
            cfg, pipeline=dataclasses.replace(
                cfg.pipeline, workspace_accumulate=True,
                accum_skip_prededupe=getattr(args, "accum_raw", False))
        )
    if num_cameras is not None and num_cameras != cfg.rig.num_cameras:
        from rt3d.config import RigConfig

        cams = tuple(cfg.rig.cameras[i % cfg.rig.num_cameras]
                     for i in range(num_cameras))
        cfg = dataclasses.replace(cfg, rig=RigConfig(cameras=cams))
    return cfg


def open_source(args, num_cameras: int, hw: Tuple[int, int] = (720, 1280)):
    if args.source == "synthetic":
        from rt3d.io.synthetic import SyntheticSource

        return SyntheticSource(
            num_cameras=num_cameras, num_frames=None, hw=hw, num_objects=1
        )
    from rt3d.io.source import ReplaySource

    return ReplaySource(args.source, loop=True)


def adopt_source_calibration(cfg, source):
    """Use the source's calibration (replay metadata / synthetic model) —
    the analog of reading ZED factory calibration at startup."""
    from rt3d.config import with_cameras

    cams = source.cameras()
    if cams:
        return with_cameras(cfg, cams)
    return cfg


def load_model_params(pipe, cfg: Config):
    """Converted weights if configured, else random init (documented:
    no pretrained checkpoints ship in this environment)."""
    w = cfg.model.weights
    if w and os.path.exists(w):
        if w.endswith(".pt"):
            from rt3d.models.yolo.convert import convert_checkpoint

            return {
                k: jax.numpy.asarray(v)
                for k, v in convert_checkpoint(w, pipe.model).items()
            }
        from rt3d.models.yolo.convert import load_params

        return {k: jax.numpy.asarray(v) for k, v in load_params(w).items()}
    return pipe.model.init(jax.random.PRNGKey(0))


def maybe_quantize_params(pipe, params, source, args, calib_frames=4):
    """`--quantize`: post-training int8 conversion of the conv stack,
    calibrated on the actual source (replay or synthetic) through the
    pipeline's own preprocessing. No-op without the flag."""
    if not getattr(args, "quantize", False):
        return params
    from rt3d.models.yolo import quant

    # a precomputed sidecar next to the weights artifact skips the
    # stats-forward compile (tools/calibrate_quant.py); its fingerprint
    # check falls back to live calibration after a retrain
    scales = None
    w = pipe.cfg.model.weights
    if w:
        sp = quant.sidecar_path(w)
        if os.path.exists(sp):
            scales = quant.load_act_scales(sp, weights_path=w)
    # only render+preprocess calibration frames when actually needed
    batches = () if scales else quant.synth_calib_batches(
        pipe, source, frames=tuple(range(calib_frames)))
    return quant.quantize_params(pipe.model, params, batches,
                                 act_scales=scales)
