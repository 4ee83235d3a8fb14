"""Model zoo: YOLO11 instance segmentation in pure functional JAX."""

from rt3d.models.yolo.model import YoloSeg, yolo_seg  # noqa: F401
