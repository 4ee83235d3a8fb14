"""Shared tiny-config helpers for pipeline-level tests (1-core CPU box)."""

import dataclasses

import numpy as np

from rt3d.config import (
    CameraConfig, Config, Extrinsics, Intrinsics, ModelConfig, PipelineConfig,
    RigConfig, TrackerConfig,
)

H, W = 96, 160


def tiny_config(num_cameras=2, class_filter=(), conf=0.05) -> Config:
    intr = Intrinsics(fx=88.0, fy=88.0, cx=W / 2, cy=H / 2, width=W, height=H)
    cams = []
    for i in range(num_cameras):
        off = (i - (num_cameras - 1) / 2) * 0.08
        cams.append(CameraConfig(
            name=f"cam{i+1}",
            intrinsics=intr,
            extrinsics=Extrinsics(
                rotation=((1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 0.0, -1.0)),
                translation=(0.25 + off, 0.6, 1.0),
            ),
        ))
    return Config(
        rig=RigConfig(cameras=tuple(cams)),
        model=ModelConfig(
            variant="n", input_hw=(64, 96), max_detections=4, nms_pre_topk=16,
            conf_thresh=conf, class_filter=tuple(class_filter),
        ),
        tracker=TrackerConfig(max_tracks=16),
        pipeline=PipelineConfig(
            voxel_size=0.01,
            max_points_per_object=256, max_points_fused_object=512,
            max_points_workspace=4096, max_points_workspace_fused=8192,
            max_objects_fused=8,
        ),
    )
