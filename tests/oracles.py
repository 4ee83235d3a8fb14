"""NumPy oracle implementations transcribed from the reference semantics.

Each oracle states the reference function it models (file:line in
/root/reference). These are *independent reimplementations* of the observable
behavior used to validate the fixed-shape TPU ops — deliberately written in
plain data-dependent NumPy, the opposite style of the production ops.
"""

from __future__ import annotations

import numpy as np


def backproject_oracle(mask_indices, depth_map, cx, cy, fx, fy):
    """`convert_mask_to_3d_points` (vision_pipeline_utils.py:19-36)."""
    u = mask_indices[:, 1].astype(np.float64)
    v = mask_indices[:, 0].astype(np.float64)
    z = depth_map[mask_indices[:, 0], mask_indices[:, 1]].astype(np.float64)
    ok = (z > 0) & np.isfinite(z)
    u, v, z = u[ok], v[ok], z[ok]
    x = (u - cx) * z / fx
    y = (v - cy) * z / fy
    return np.stack([x, y, z], axis=-1)


def voxel_downsample_oracle(points, voxel_size):
    """`downsample_point_cloud_gpu` (vision_pipeline_utils.py:40-44):
    round-half-to-even to the voxel grid then lexicographically-sorted
    unique rows."""
    if len(points) == 0:
        return np.zeros((0, 3), np.float32)
    q = np.round(points.astype(np.float64) / voxel_size).astype(np.int64)
    uniq = np.unique(q, axis=0)  # sorted lexicographically by np.unique
    return (uniq.astype(np.float32)) * np.float32(voxel_size)


def crop_oracle(points, xb, yb, zb):
    """`crop_point_cloud_gpu` (vision_pipeline_utils.py:78-84)."""
    m = (
        (points[:, 0] >= xb[0]) & (points[:, 0] <= xb[1])
        & (points[:, 1] >= yb[0]) & (points[:, 1] <= yb[1])
        & (points[:, 2] >= zb[0]) & (points[:, 2] <= zb[1])
    )
    return points[m]


def sor_oracle(points, nb_neighbors=20, std_ratio=1.5):
    """Open3D `remove_statistical_outlier` semantics as used at
    vision_pipeline_utils.py:48-58. Mean distance to the nb_neighbors
    nearest points *including self* divided by (nb_neighbors-1); keep
    points with mean <= mu + std_ratio * sigma (sigma unbiased)."""
    n = len(points)
    if n == 0:
        return np.zeros((0,), bool)
    d = np.linalg.norm(points[:, None, :] - points[None, :, :], axis=-1)
    k = min(nb_neighbors, n)
    part = np.sort(d, axis=1)[:, :k]  # includes self at distance 0
    mean_d = part.sum(axis=1) / max(k - 1, 1)
    mu = mean_d.mean()
    sigma = mean_d.std(ddof=1) if n > 1 else 0.0
    return mean_d <= mu + std_ratio * sigma


def subtract_oracle(workspace, objects, threshold):
    """`subtract_point_clouds_gpu` (vision_pipeline_utils.py:168-187)."""
    if len(objects) == 0:
        return workspace.copy()
    d = np.linalg.norm(workspace[:, None, :] - objects[None, :, :], axis=-1)
    keep = d.min(axis=1) > threshold
    return workspace[keep]


def fuse_oracle(objs1, objs2, distance_threshold, sor=None):
    """Greedy centroid fusion matching rt3d's documented semantics (see
    rt3d/geometry/fusion.py docstring; reference fuse_point_clouds_centroid
    vision_pipeline_utils.py:88-165 minus its removal bug).

    objs1/objs2: list of (points (N,3), class_id). Returns list of
    (points, class_id, was_fused_pair).
    """
    sor = sor or (lambda p: p)
    from collections import defaultdict

    by1, by2 = defaultdict(list), defaultdict(list)
    for i, (p, c) in enumerate(objs1):
        by1[c].append(i)
    for j, (p, c) in enumerate(objs2):
        by2[c].append(j)

    matched2 = set()
    results = []
    for i, (p1, c) in enumerate(objs1):
        uncond = len(by1[c]) == 1 and len(by2[c]) == 1
        cent1 = p1.mean(axis=0)
        best, bestd = None, np.inf
        for j in by2[c]:
            if j in matched2:
                continue
            cent2 = objs2[j][0].mean(axis=0)
            dd = np.linalg.norm(cent1 - cent2)
            if (uncond or dd < distance_threshold) and dd < bestd:
                best, bestd = j, dd
        if best is not None:
            matched2.add(best)
            results.append((np.vstack([p1, objs2[best][0]]), c, True))
        else:
            results.append((p1, c, False))
    for j, (p2, c) in enumerate(objs2):
        if j not in matched2:
            results.append((p2, c, False))
    return results
