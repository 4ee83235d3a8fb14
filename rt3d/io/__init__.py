"""Frame IO: the FrameSource ABI and its implementations.

Replaces the reference's ZED SDK capture layer (`pyzed.sl` usage at
`2cam/2cams_mask_gpu.py:62-96,179-215`) with a replayable abstraction:
recorded stereo+depth sequences drive the pipeline bit-exactly (the
benchmark path), a synthetic source generates analytic scenes for tests,
and live-camera capture is a plug-in point behind the same ABI.
"""

from rt3d.io.format import SequenceSpec, read_header, write_sequence  # noqa: F401
from rt3d.io.source import FramePacket, FrameSource, ReplaySource  # noqa: F401
from rt3d.io.synthetic import SyntheticSource  # noqa: F401
