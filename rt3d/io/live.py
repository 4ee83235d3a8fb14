"""Live-camera plug-in point for the FrameSource ABI.

The reference's capture layer is the ZED SDK (`pyzed.sl` — C++/CUDA, USB3
stereo cameras; open/grab/retrieve loop at `2cam/2cams_mask_gpu.py:62-96,
179-215`). That hardware does not exist in this environment, so live
capture is a plug-in: implement `grab()` against any camera SDK and the
rest of the framework (pipeline, driver, CSVs, viz) works unchanged.

`CallbackSource` adapts any frame-producing callable; a ZED adapter would
be ~30 lines against `pyzed` following the same shape (left-view BGR image
+ f32 depth map + per-grab status code, intrinsics from factory
calibration, extrinsics from rig calibration).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Tuple

import numpy as np

from rt3d.config import CameraConfig
from rt3d.io.source import FramePacket


class CallbackSource:
    """FrameSource over a user callback.

    grab(index) -> (rgb (C,H,W,3) u8 BGR, depth (C,H,W) f32, status (C,) u32)
    """

    def __init__(
        self,
        grab: Callable[[int], Tuple[np.ndarray, np.ndarray, np.ndarray]],
        cameras: List[CameraConfig],
        hw: Tuple[int, int],
        num_frames: Optional[int] = None,
    ):
        self._grab = grab
        self._cams = cameras
        self._hw = hw
        self._n = num_frames

    @property
    def num_cameras(self) -> int:
        return len(self._cams)

    @property
    def num_frames(self) -> Optional[int]:
        return self._n

    @property
    def frame_hw(self) -> Tuple[int, int]:
        return self._hw

    def cameras(self) -> List[CameraConfig]:
        return list(self._cams)

    def get(self, index: int) -> FramePacket:
        rgb, depth, status = self._grab(index)
        return FramePacket(rgb=rgb, depth=depth,
                           status=np.asarray(status, np.uint32), index=index)

    def close(self) -> None:
        pass
