"""Drive the rt3d geometry library end-to-end on a synthetic scene.

Builds an analytic two-camera tabletop: a flat workspace plane plus a
box-shaped object, renders per-camera depth maps, then runs the full public
chain — dense backprojection -> rigid transform to robot frame -> AABB crop
-> voxel downsample (workspace) and masked per-object voxel downsample ->
two-camera centroid fusion (+SOR) -> workspace subtraction — and checks the
physical invariants of the result.
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.geometry import (
    PointBuffer,
    aabb_mask,
    backproject_depth_grid,
    rigid_transform,
    subtract_min_dist,
    voxel_downsample,
    voxel_downsample_masks,
)
from rt3d.geometry.fusion import ObjectSet, flatten_objects, fuse_centroid


def make_camera_scene(h=180, w=320, fx=160.0, fy=160.0, shift=0.0):
    """Top-down camera 1 m above a z=0 table with a 10 cm cube at centre."""
    cx, cy = w / 2, h / 2
    us, vs = np.meshgrid(np.arange(w), np.arange(h))
    depth = np.full((h, w), 1.0, np.float32)  # table plane at 1 m
    # object: a raised box (5 cm tall) occupying a pixel window
    u0, u1 = int(cx - 25 + shift), int(cx + 25 + shift)
    v0, v1 = int(cy - 20), int(cy + 20)
    obj = np.zeros((h, w), bool)
    obj[v0:v1, u0:u1] = True
    depth[obj] = 0.95
    depth[0:4, 0:4] = np.nan  # some invalid pixels
    return depth, obj, (fx, fy, cx, cy)


def main():
    print(f"devices: {jax.devices()}")
    voxel = 0.005
    h, w = 180, 320

    # camera -> robot: camera looks straight down from z=1m
    R = np.array([[1, 0, 0], [0, -1, 0], [0, 0, -1]], np.float32)
    t = np.array([0.25, 0.6, 1.0], np.float32)

    depth1, obj1, intr1 = make_camera_scene(h, w)
    depth2, obj2, intr2 = make_camera_scene(h, w, shift=2.0)  # slight parallax

    @jax.jit
    def per_camera(depth, mask):
        xyz, valid = backproject_depth_grid(depth, *_intr_args(intr1))
        pts = rigid_transform(xyz.reshape(-1, 3), jnp.asarray(R), jnp.asarray(t))
        valid = valid.reshape(-1)
        ws_valid = valid & aabb_mask(pts, (-0.25, 0.75), (-0.5, 1.75), (-0.05, 2.0))
        ws, ws_ovf = voxel_downsample(pts, ws_valid, voxel, 16384)
        objs, obj_ovf = voxel_downsample_masks(
            pts, valid, mask.reshape(1, -1), voxel, 4096
        )
        return ws, ws_ovf, objs, obj_ovf

    def _intr_args(intr):
        fx, fy, cx, cy = intr
        return fx, fy, cx, cy

    t0 = time.time()
    ws1, ovf1, o1, oovf1 = per_camera(jnp.asarray(depth1), jnp.asarray(obj1))
    ws2, ovf2, o2, oovf2 = per_camera(jnp.asarray(depth2), jnp.asarray(obj2))
    jax.block_until_ready(ws2.points)
    print(f"per-camera chain (compile+2 runs): {time.time()-t0:.2f}s")
    n_ws1, n_ws2 = int(ws1.count), int(ws2.count)
    n_o1, n_o2 = int(o1.count[0]), int(o2.count[0])
    print(f"workspace voxels cam1={n_ws1} cam2={n_ws2} (overflow {int(ovf1)},{int(ovf2)})")
    print(f"object voxels cam1={n_o1} cam2={n_o2} (overflow {int(oovf1[0])},{int(oovf2[0])})")
    assert n_ws1 > 1000 and n_o1 > 100, "scene produced too few points"

    # wrap per-camera objects into slot sets and fuse
    def to_set(o):
        return ObjectSet(
            points=o.points, valid=o.valid,
            class_id=jnp.asarray([39], jnp.int32),
            present=jnp.asarray([True]),
            track_id=jnp.asarray([1], jnp.int32),
        )

    fused = jax.jit(lambda a, b: fuse_centroid(a, b, 0.3))(to_set(o1), to_set(o2))
    n_fused_slots = int(np.asarray(fused.present).sum())
    print(f"fused object slots: {n_fused_slots}")
    assert n_fused_slots == 1, "1-v-1 same-class objects must fuse to one"

    flat, flat_ovf = flatten_objects(fused, 8192)
    ws_all = PointBuffer(
        points=jnp.concatenate([ws1.points, ws2.points]),
        valid=jnp.concatenate([ws1.valid, ws2.valid]),
    )
    out = jax.jit(lambda a, b: subtract_min_dist(a, b, 0.02))(ws_all, flat)
    kept = np.asarray(out.points)[np.asarray(out.valid)]
    before = int(ws_all.count)
    after = len(kept)
    print(f"workspace before={before} after subtraction={after}")
    assert after < before, "subtraction removed nothing"

    # physical invariant: no kept workspace point within 2 cm of the object
    obj_pts = np.asarray(flat.points)[np.asarray(flat.valid)]
    from scipy.spatial import cKDTree

    d, _ = cKDTree(obj_pts).query(kept, k=1)
    print(f"min distance kept->object: {d.min():.4f} m")
    assert d.min() > 0.02, "subtraction threshold violated"

    # object centroid should sit ~5cm above the table plane region (z)
    cz = obj_pts[:, 2].mean()
    print(f"object centroid z (robot frame): {cz:.3f} m (expect ~0.05)")
    assert 0.02 < cz < 0.08

    print("GEOMETRY E2E OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
