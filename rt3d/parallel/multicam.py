"""Camera-stream sharding: one camera pipeline per device via shard_map.

The reference processes its two cameras back-to-back on one GPU
(`2cams_mask_gpu.py:272-291` — two sequential `model.track` calls). Here
each device runs the full per-camera pipeline on its local camera shard;
the only cross-device communication is ONE `all_gather` of the compact
per-object buffers + workspace voxels (a few hundred KB) right before
fusion, which then runs replicated (SPMD) on every device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from rt3d.geometry.ops import PointBuffer
from rt3d.pipeline.step import CameraCalib, FrameOutputs, Pipeline, PipelineState


def make_sharded_step(pipeline: Pipeline, mesh: Mesh, cam_axis: str = "cam"):
    """Build a jitted multi-device step.

    Camera-axis arrays (rgb, depth, calib, tracker state) are sharded over
    `cam_axis`; params are replicated. Fused outputs (objects, workspace)
    come back replicated; per-camera outputs stay sharded.
    """
    cam_p = P(cam_axis)

    def spec_like_cam(tree):
        return jax.tree_util.tree_map(lambda _: cam_p, tree)

    def spec_rep(tree):
        return jax.tree_util.tree_map(lambda _: P(), tree)

    def state_specs(state: PipelineState):
        # per-camera state (tracker, GMC gray frame) shards over the cam
        # axis; the workspace accumulator is GLOBAL state — it folds the
        # POST-FUSION workspace, so it lives replicated and is updated in
        # the replicated section below (identical on every device).
        return PipelineState(
            tracker=spec_like_cam(state.tracker),
            prev_gray=cam_p,
            accum=spec_rep(state.accum),
        )

    def local_step(params, state: PipelineState, rgb, depth, calib: CameraCalib):
        # ---- per-camera work on the local shard (usually 1 camera) ----
        images = pipeline.preprocess(rgb)
        det, protos, emb = pipeline.detect(params, images)
        state, ids = pipeline.track(state, det, det_emb=emb, images=images)
        masks = pipeline.masks(protos, det)
        objs, obj_ovf = pipeline.object_clouds(depth, masks, det, ids, calib)
        ws, ws_ovf = pipeline.workspace_clouds(depth, calib)

        # ---- the one collective: gather object sets + workspace voxels ----
        objs_all = jax.tree_util.tree_map(
            lambda x: jax.lax.all_gather(x, cam_axis, axis=0, tiled=True), objs
        )
        ws_all_pts = jax.lax.all_gather(ws.points, cam_axis, axis=0, tiled=True)
        ws_all_valid = jax.lax.all_gather(ws.valid, cam_axis, axis=0, tiled=True)

        # ---- replicated fusion + subtraction (identical on all devices) ----
        fused, flat, flat_ovf = pipeline.fuse(objs_all)
        ws_buf = PointBuffer(
            points=ws_all_pts.reshape(-1, 3), valid=ws_all_valid.reshape(-1)
        )
        ws_out = pipeline.subtract(ws_buf, flat)
        acc_ovf = jnp.int32(0)
        pc = pipeline.cfg.pipeline
        if pc.workspace_accumulate:
            from rt3d.geometry.voxel_sets import (
                accumulate_voxels,
                extract_accumulated,
            )

            acc, acc_ovf = accumulate_voxels(
                state.accum, ws_out.points, ws_out.valid, pc.voxel_size,
                pc.dedupe_bound_m, decay=pc.accum_decay,
                obs_weight=pc.accum_obs_weight,
            )
            state = state.replace(accum=acc)
            ws_out = extract_accumulated(
                acc, pc.voxel_size, pc.dedupe_bound_m,
                min_weight=pc.accum_min_weight,
            )
        overflow = (
            jax.lax.psum(jnp.sum(obj_ovf) + jnp.sum(ws_ovf), cam_axis)
            + flat_ovf + acc_ovf
        )
        out = FrameOutputs(
            detections=det, track_ids=ids, objects=fused, objects_flat=flat,
            workspace=ws_out, per_camera_objects=objs, overflow=overflow,
        )
        return state, out

    state_proto = pipeline.init_state()
    calib_proto = CameraCalib.from_config(pipeline.cfg)

    def out_specs_for(state, out: FrameOutputs):
        return (
            state_specs(state),
            FrameOutputs(
                detections=spec_like_cam(out.detections),
                track_ids=cam_p,
                objects=spec_rep(out.objects),
                objects_flat=spec_rep(out.objects_flat),
                workspace=spec_rep(out.workspace),
                per_camera_objects=spec_like_cam(out.per_camera_objects),
                overflow=P(),
            ),
        )

    # Build out_specs from an abstract eval of the SINGLE-DEVICE step — it
    # returns the same (state, FrameOutputs) tree structure but contains no
    # collectives, so it can be eval_shape'd outside the mesh (the local
    # step's all_gather would hit "unbound axis name" there).
    c = pipeline.cfg.rig.num_cameras
    cam = pipeline.cfg.rig.cameras[0]
    h, w = cam.intrinsics.height, cam.intrinsics.width
    params_shapes = pipeline.model.param_shapes()
    abs_params = {
        k: jax.ShapeDtypeStruct(s, jnp.float32) for k, (s, _) in params_shapes.items()
    }
    abs_state = jax.eval_shape(pipeline.init_state)
    abs_state_out, abs_out = jax.eval_shape(
        pipeline.step,
        abs_params,
        abs_state,
        jax.ShapeDtypeStruct((c, h, w, 3), jnp.uint8),
        jax.ShapeDtypeStruct((c, h, w), jnp.float32),
        jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), calib_proto
        ),
    )
    out_specs = out_specs_for(abs_state_out, abs_out)

    sharded = shard_map(
        local_step,
        mesh=mesh,
        in_specs=(
            # a single P() is a pytree PREFIX: params replicate leaf-wise
            # whatever their key structure — f32 kernels or the int8
            # kernel_q8/scale triples of a quantized dict (quant.py)
            P(),
            state_specs(state_proto),
            cam_p,
            cam_p,
            spec_like_cam(calib_proto),
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded)
