"""Vectorized multi-object tracking: ByteTrack on fixed track slots.

Replaces the ultralytics tracker stack the reference drives via
`model.track(persist=True, tracker="bytetrack.yaml")`
(`2cam/vision_pipeline_utils.py:258-277`): Kalman prediction, two-stage
IoU association (high/low score), linear assignment, and the track life
cycle — all as one jitted step over a `TrackerState` pytree, so tracker
state is explicit and checkpointable instead of hidden module state.
"""

from rt3d.tracking.kalman import (  # noqa: F401
    gating_distance,
    kalman_initiate,
    kalman_predict,
    kalman_update,
    xyah_to_xyxy,
    xyxy_to_xyah,
)
from rt3d.tracking.deepsort import deepsort_step  # noqa: F401
from rt3d.tracking.assignment import hungarian, solve_matching  # noqa: F401
from rt3d.tracking.bytetrack import (  # noqa: F401
    TrackerState,
    bytetrack_init,
    bytetrack_step,
)
