"""Fixed-shape, jit-friendly point-cloud geometry ops.

Everything here operates on padded buffers: a point cloud is a pair
``(points: (N, 3) f32, valid: (N,) bool)`` with a compile-time capacity N.
This replaces the reference's data-dependent shapes (`torch.nonzero`,
boolean indexing, `torch.unique`) which do not map onto XLA/TPU.
"""

from rt3d.geometry.ops import (  # noqa: F401
    PointBuffer,
    aabb_mask,
    backproject_depth_grid,
    compact_points,
    masked_centroid,
    rigid_transform,
    voxel_downsample,
    voxel_downsample_masks,
)
from rt3d.geometry.sor import sor_inlier_mask, sor_filter  # noqa: F401
from rt3d.geometry.subtract import subtract_min_dist  # noqa: F401
from rt3d.geometry.fusion import fuse_centroid  # noqa: F401
from rt3d.geometry.image import (  # noqa: F401
    dilate_mask,
    erode_mask,
    random_subsample,
)
from rt3d.geometry.voxel_sets import (  # noqa: F401
    VoxelAccumulator,
    accumulate_voxels,
    extract_accumulated,
    subtract_voxel_sets,
)
