"""Produce the docs example render: synthetic 2-camera scene with
ground-truth masks through the full geometry pipeline on the TPU, rendered
before/after workspace subtraction."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.config import reference_2cam_config
from rt3d.io.synthetic import SyntheticSource
from rt3d.models.yolo.postprocess import Detections
from rt3d.pipeline.step import CameraCalib, build_pipeline
from rt3d.geometry.fusion import flatten_objects, fuse_centroid
from rt3d.geometry.ops import PointBuffer
from rt3d.geometry.subtract import subtract_min_dist
from rt3d.viz.render import render_scene


def main() -> int:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "docs"
    os.makedirs(out_dir, exist_ok=True)
    from rt3d.config import with_cameras

    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(720, 1280),
                          num_objects=2)
    cfg = with_cameras(reference_2cam_config(), src.cameras())
    pipe = build_pipeline(cfg)
    calib = CameraCalib.from_config(cfg)
    pkt = src.get(0)
    gt = src.gt_masks(0)
    d_cap = cfg.model.max_detections

    masks = np.zeros((2, d_cap, 720, 1280), bool)
    masks[:, :2] = gt
    det = Detections(
        boxes=jnp.zeros((2, d_cap, 4)),
        scores=jnp.zeros((2, d_cap)).at[:, :2].set(0.9),
        classes=jnp.zeros((2, d_cap), jnp.int32).at[:, 0].set(39).at[:, 1].set(41),
        coeffs=jnp.zeros((2, d_cap, cfg.model.num_mask_coeffs)),
        valid=jnp.zeros((2, d_cap), bool).at[:, :2].set(True),
    )
    ids = jnp.full((2, d_cap), -1, jnp.int32).at[:, 0].set(1).at[:, 1].set(2)

    objs, _ = jax.jit(pipe.object_clouds)(
        jnp.asarray(pkt.depth), jnp.asarray(masks), det, ids, calib
    )
    sets = [jax.tree_util.tree_map(lambda x: x[i], objs) for i in range(2)]
    fused = jax.jit(lambda a, b: fuse_centroid(
        a, b, cfg.pipeline.fusion_distance_threshold))(sets[0], sets[1])
    flat, _ = flatten_objects(fused, 8192)
    ws, _ = jax.jit(pipe.workspace_clouds)(jnp.asarray(pkt.depth), calib)
    ws_all = PointBuffer(points=ws.points.reshape(-1, 3),
                         valid=ws.valid.reshape(-1))
    ws_out = jax.jit(lambda a, b: subtract_min_dist(
        a, b, cfg.pipeline.subtraction_threshold))(ws_all, flat)

    def np_pts(buf):
        return np.asarray(buf.points)[np.asarray(buf.valid)]

    ws_np, obj_np, sub_np = np_pts(ws_all), np_pts(flat), np_pts(ws_out)
    sub_view = sub_np[np.random.default_rng(0).uniform(size=len(sub_np)) < 0.3]
    p = render_scene(
        [(sub_view, "#9aa7b0", "workspace (subtracted)"),
         (obj_np, "#e4572e", "fused objects")],
        os.path.join(out_dir, "example_scene.png"),
        title="rt3d: fused objects + subtracted workspace (synthetic 2-cam, 5 mm voxel)",
    )
    print(f"workspace {len(ws_np)} -> subtracted {len(sub_np)}; "
          f"objects {len(obj_np)}; wrote {p}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
