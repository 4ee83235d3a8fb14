from rt3d.models.yolo.model import YoloSeg, yolo_seg  # noqa: F401
from rt3d.models.yolo.postprocess import (  # noqa: F401
    Detections,
    decode_predictions,
    letterbox_params,
    nms_fixed,
    preprocess_frame,
)
