"""Step driver loop, timing capture, and CSV observability.

Mirrors the reference's logging surface exactly (`fps_log.csv` with
`Timestamp,FPS` rows and the per-stage `timings.csv`,
`2cam/vision_pipeline_utils.py:329-355`) so its offline visualizers and our
comparison tooling read either system's output interchangeably.
"""

from rt3d.runtime.timing import STAGES, TimingLog  # noqa: F401
from rt3d.runtime.driver import PipelineDriver  # noqa: F401
from rt3d.runtime.profiling import format_op_times, profile_op_times  # noqa: F401
from rt3d.runtime.checkpoint import load_pytree, save_pytree  # noqa: F401
