"""Per-frame pipeline steps: detection -> tracking -> clouds -> fusion.

The reference runs seven host-orchestrated stages per frame with >=6
host<->GPU round-trips (`SURVEY.md` §3.1). Here stages S3–S7 (workspace
clouds, YOLO inference+tracking, mask back-projection, fusion, subtraction)
compile into ONE jitted TPU program per frame-pair; the host only feeds
frames and reads back compact padded buffers.
"""

from rt3d.pipeline.step import (  # noqa: F401
    CameraCalib,
    FrameOutputs,
    PipelineState,
    build_pipeline,
)
