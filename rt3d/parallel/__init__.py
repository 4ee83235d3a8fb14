"""Device meshes, sharding rules, and the camera-sharded pipeline step.

The reference's only parallel axis is two camera streams processed
sequentially on one GPU (`SURVEY.md` §2.3). Here camera streams shard over
ICI via `jax.shard_map` (one stream per device), fusion is the single
cross-stream collective (an `all_gather` of compact padded object buffers),
and training scales with dp (batch) x fsdp (parameter) sharding.
"""

from rt3d.parallel.mesh import (  # noqa: F401
    fsdp_param_shardings,
    make_mesh,
)
from rt3d.parallel.multicam import make_sharded_step  # noqa: F401
