"""The fused per-frame pipeline step.

Maps the reference's per-iteration stages (`2cam/2cams.py:165-200`) onto a
single jitted program:

  S1/S2 (frame/depth retrieval)  -> host: FrameSource + one device upload
  S3 workspace clouds            -> strided dense backprojection + crop +
                                    voxel dedupe        (was `process_point_clouds`)
  S4 YOLO + tracking             -> batched YOLO11-seg forward + static NMS
                                    + vectorized ByteTrack (was `model.track` x2)
  S5 mask processing             -> dense masked backprojection + shared-sort
                                    voxel dedupe        (was `process_masks`)
  S6 fusion                      -> greedy centroid fusion (was `fuse_point_clouds`)
  S7 subtraction                 -> tiled min-distance   (was `subtract_point_clouds`)

Design rule: ONE upload (rgb+depth) and ONE download (compact padded
buffers) per frame-pair; everything between stays on device.

Per-camera tracking note: ultralytics keyed both of the reference's
sequential `model.track` calls to the same tracker instance (predictor
tracker index 0), silently sharing IDs across cameras. We keep one tracker
state per camera — the sane semantics — and document the divergence.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from rt3d.config import Config
from rt3d.geometry.fusion import ObjectSet, flatten_objects, fuse_centroid
from rt3d.geometry.image import erode_mask
from rt3d.geometry.ops import (
    PointBuffer,
    aabb_mask,
    backproject_depth_grid,
    rigid_transform,
    strided_grid_downsample,
    voxel_downsample,
    voxel_downsample_grid,
    voxel_downsample_masks,
)
from rt3d.geometry.sor import sor_inlier_mask_windowed
from rt3d.geometry.subtract import subtract_min_dist
from rt3d.geometry.voxel_sets import (
    VoxelAccumulator,
    accumulate_voxels,
    extract_accumulated,
)
from rt3d.models.yolo.model import YoloSeg
from rt3d.models.yolo.postprocess import (
    Detections,
    assemble_masks_retina,
    boxes_to_original,
    decode_predictions,
    letterbox_params,
    nms_fixed,
    preprocess_frame,
    suppress_center_duplicates,
)
from rt3d.tracking.bytetrack import TrackerState, bytetrack_init, bytetrack_step


def _stack_cams(items):
    """Stack per-camera results (pytrees of arrays/scalars) into
    camera-leading pytrees — companion of the static per-camera loops that
    replace vmap around sort-heavy ops (a vmapped lax.sort inherits a
    batched (C, N) T(2,128) layout that wastes 3/4 of every sublane tile;
    per-camera flat sorts get the fast 1-D layout)."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *items)


@struct.dataclass
class CameraCalib:
    """Device-side calibration, batched over the camera axis."""

    fx: jax.Array  # (C,)
    fy: jax.Array
    cx: jax.Array
    cy: jax.Array
    rotation: jax.Array     # (C, 3, 3) camera -> robot
    translation: jax.Array  # (C, 3)

    @staticmethod
    def from_config(cfg: Config) -> "CameraCalib":
        import numpy as np

        cams = cfg.rig.cameras
        return CameraCalib(
            fx=jnp.asarray([c.intrinsics.fx for c in cams], jnp.float32),
            fy=jnp.asarray([c.intrinsics.fy for c in cams], jnp.float32),
            cx=jnp.asarray([c.intrinsics.cx for c in cams], jnp.float32),
            cy=jnp.asarray([c.intrinsics.cy for c in cams], jnp.float32),
            rotation=jnp.asarray(
                np.stack([c.extrinsics.R for c in cams]), jnp.float32
            ),
            translation=jnp.asarray(
                np.stack([c.extrinsics.t for c in cams]), jnp.float32
            ),
        )


@struct.dataclass
class PipelineState:
    """All cross-frame state, one pytree (checkpointable; the reference's
    only persistent state was the hidden ultralytics tracker)."""

    tracker: TrackerState  # leading camera axis on every leaf
    # previous frame's downsampled grayscale per camera, for BoT-SORT GMC
    # (zeros-sized (C, 1, 1) placeholder when GMC is off)
    prev_gray: jax.Array
    # persistent workspace voxel accumulator (capacity-1 placeholder when
    # cfg.pipeline.workspace_accumulate is off)
    accum: VoxelAccumulator


@struct.dataclass
class FrameOutputs:
    detections: Detections        # leading camera axis
    track_ids: jax.Array          # (C, D) int32
    objects: ObjectSet            # fused, robot frame
    objects_flat: PointBuffer     # all fused object points, compacted
    workspace: PointBuffer        # subtracted workspace cloud
    per_camera_objects: ObjectSet  # leading camera axis (pre-fusion)
    overflow: jax.Array           # scalar total dropped-point count


@dataclass(frozen=True)
class Pipeline:
    """Static pipeline bundle: config + model + jit-ready step callables."""

    cfg: Config
    model: YoloSeg

    # ------------------------------------------------------------------
    @property
    def _use_reid(self) -> bool:
        t = self.cfg.tracker
        # DeepSORT is appearance-primary by definition; with_reid is implied
        return (t.tracker_type == "botsort" and t.with_reid) \
            or t.tracker_type == "deepsort"

    @property
    def _use_gmc(self) -> bool:
        t = self.cfg.tracker
        return t.tracker_type in ("botsort", "deepsort") and t.gmc

    @property
    def _tracker_step(self):
        if self.cfg.tracker.tracker_type == "deepsort":
            from rt3d.tracking.deepsort import deepsort_step

            return deepsort_step
        return bytetrack_step

    def _gray_hw(self):
        h, w = self.model.input_hw
        return (h // 4, w // 4)

    def init_state(self) -> PipelineState:
        c = self.cfg.rig.num_cameras
        t = self.cfg.tracker
        trackers = jax.vmap(
            lambda _: bytetrack_init(t.max_tracks, emb_dim=t.emb_dim)
        )(jnp.arange(c))
        gh, gw = self._gray_hw() if self._use_gmc else (1, 1)
        p = self.cfg.pipeline
        cap = p.accum_capacity if p.workspace_accumulate else 1
        return PipelineState(
            tracker=trackers,
            prev_gray=jnp.zeros((c, gh, gw), jnp.float32),
            accum=VoxelAccumulator.empty(cap),
        )

    # ------------------------------------------------------------------
    # stage pieces (also used standalone by the profiling driver)
    # ------------------------------------------------------------------

    def _meta(self):
        cam = self.cfg.rig.cameras[0]
        src_hw = (cam.intrinsics.height, cam.intrinsics.width)
        return letterbox_params(src_hw, self.model.input_hw)

    def preprocess(self, rgb: jax.Array) -> jax.Array:
        """(C, H, W, 3) u8 -> (C, h, w, 3) letterboxed batch
        (ModelConfig.preprocess_dtype, f32 default)."""
        meta = self._meta()
        pdt = jnp.dtype(self.cfg.model.preprocess_dtype)
        return jax.vmap(lambda f: preprocess_frame(f, meta, dtype=pdt))(rgb)

    def detect(
        self, params, images: jax.Array
    ) -> Tuple[Detections, jax.Array, Optional[jax.Array]]:
        """Batched forward + decode + NMS. Returns (detections with boxes in
        ORIGINAL pixels (camera axis leading), protos (C, hp, wp, nm),
        embeddings (C, D, E) or None)."""
        m, p = self.model, self.cfg.model
        meta = self._meta()
        (box_l, cls_l, coeff_l, protos), feats = m.forward_with_feats(
            params, images
        )
        boxes, scores = decode_predictions(m, box_l, cls_l)
        class_mask = jnp.zeros((p.num_classes,), bool)
        if p.class_filter:
            class_mask = class_mask.at[jnp.asarray(p.class_filter)].set(True)
        else:
            class_mask = jnp.ones((p.num_classes,), bool)

        def one(b, s, c):
            det = nms_fixed(
                b, s, c,
                conf_thresh=p.conf_thresh, iou_thresh=p.iou_thresh,
                max_det=p.max_detections, pre_topk=p.nms_pre_topk,
                class_mask=class_mask,
            )
            det = det.replace(boxes=boxes_to_original(det.boxes, meta))
            if p.dedupe_center_px > 0:
                det = suppress_center_duplicates(det, p.dedupe_center_px)
            return det

        det = jax.vmap(one)(boxes, scores, coeff_l)
        emb = None
        if self._use_reid:
            emb = jax.vmap(
                lambda f, d: self._pooled_embeddings(f, d, meta)
            )(feats[0].astype(jnp.float32), det)
        return det, protos, emb

    def _pooled_embeddings(self, p3: jax.Array, det: Detections, meta):
        """Appearance features for BoT-SORT: the stride-8 neck feature at
        each box centre, channel-group-pooled to `emb_dim`, L2-normalized.
        Replaces the external ReID network of classic BoT-SORT with the
        detector's own features (zero extra conv cost)."""
        e = self.cfg.tracker.emb_dim
        hf, wf, c = p3.shape
        assert c % e == 0, (c, e)
        cx = (det.boxes[:, 0] + det.boxes[:, 2]) / 2
        cy = (det.boxes[:, 1] + det.boxes[:, 3]) / 2
        fx = jnp.clip(((cx * meta.ratio + meta.pad_left) / 8).astype(jnp.int32), 0, wf - 1)
        fy = jnp.clip(((cy * meta.ratio + meta.pad_top) / 8).astype(jnp.int32), 0, hf - 1)
        v = p3[fy, fx]  # (D, C)
        v = v.reshape(v.shape[0], e, c // e).mean(axis=-1)
        return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)

    def track(
        self,
        state: PipelineState,
        det: Detections,
        det_emb: Optional[jax.Array] = None,
        images: Optional[jax.Array] = None,
    ) -> Tuple[PipelineState, jax.Array]:
        tcfg = self.cfg.tracker
        fps = self.cfg.rig.cameras[0].fps
        prev_gray = state.prev_gray

        if self._use_gmc and images is not None:
            from rt3d.tracking.botsort import (
                estimate_affine_gmc,
                estimate_translation_gmc,
                rescale_warp,
                translation_warp,
            )

            gh, gw = self._gray_hw()
            gray = jax.vmap(
                lambda im: jax.image.resize(im.mean(axis=-1), (gh, gw), "linear")
            )(images.astype(jnp.float32))
            if tcfg.gmc_method == "affine":
                warps = jax.vmap(estimate_affine_gmc)(prev_gray, gray)
            else:
                warps = jax.vmap(
                    lambda a, b: translation_warp(estimate_translation_gmc(a, b))
                )(prev_gray, gray)
            # warps live at 1/4-letterbox scale; boxes in ORIGINAL pixels:
            # p_small = (ratio/4) * p_orig + pad/4
            meta = self._meta()
            shifts = jax.vmap(
                lambda wp: rescale_warp(
                    wp, meta.ratio / 4.0,
                    (meta.pad_left / 4.0, meta.pad_top / 4.0),
                )
            )(warps)
            prev_gray = gray
        else:
            shifts = None

        step_fn = self._tracker_step
        if self._use_reid and det_emb is not None:
            def one(ts, d, e, sh):
                return step_fn(ts, d, tcfg, frame_rate=fps,
                               det_emb=e, gmc_warp=sh)

            if shifts is not None:
                new_tracker, ids = jax.vmap(one)(state.tracker, det, det_emb, shifts)
            else:
                new_tracker, ids = jax.vmap(
                    lambda ts, d, e: step_fn(
                        ts, d, tcfg, frame_rate=fps, det_emb=e)
                )(state.tracker, det, det_emb)
        elif shifts is not None:
            new_tracker, ids = jax.vmap(
                lambda ts, d, sh: step_fn(
                    ts, d, tcfg, frame_rate=fps, gmc_warp=sh)
            )(state.tracker, det, shifts)
        else:
            new_tracker, ids = jax.vmap(
                lambda ts, d: step_fn(ts, d, tcfg, frame_rate=fps)
            )(state.tracker, det)
        return PipelineState(tracker=new_tracker, prev_gray=prev_gray,
                             accum=state.accum), ids

    def masks(self, protos: jax.Array, det: Detections) -> jax.Array:
        """(C, D, H, W) bool full-resolution instance masks; optionally
        eroded per mask (`2cams_mask_cpu.py:583-586` applies cv2 12x12
        erosion to every mask before backprojection)."""
        meta = self._meta()
        rdt = jnp.dtype(self.cfg.model.mask_resize_dtype)

        def one(pr, d):
            return assemble_masks_retina(pr, d.coeffs, d.boxes, meta,
                                         resize_dtype=rdt)

        out = jax.vmap(one)(protos, det)
        k = self.cfg.pipeline.erode_kernel
        if k > 0:
            out = erode_mask(out, k)
        return out

    def dense_robot_points(
        self, depth: jax.Array, calib: CameraCalib
    ) -> Tuple[jax.Array, jax.Array]:
        """Dense per-pixel points in the ROBOT frame, shared by the object
        and workspace paths (computed once per frame): (C, H, W, 3) and a
        (C, H, W) validity mask."""

        def one(depth_c, fx, fy, cx, cy, R, t):
            xyz, valid = backproject_depth_grid(depth_c, fx, fy, cx, cy)
            pts = rigid_transform(xyz, R, t)
            return pts, valid

        return jax.vmap(one)(
            depth, calib.fx, calib.fy, calib.cx, calib.cy,
            calib.rotation, calib.translation,
        )

    def object_clouds(
        self,
        depth: jax.Array,          # (C, H, W) f32
        masks: jax.Array,          # (C, D, H, W) bool
        det: Detections,
        track_ids: jax.Array,      # (C, D)
        calib: CameraCalib,
        dense=None,                # optional precomputed dense_robot_points
    ) -> Tuple[ObjectSet, jax.Array]:
        """Reference S5: per-mask backproject -> transform -> voxel dedupe
        (`vision_pipeline_utils.py:292-304`), all detections at once."""
        p = self.cfg.pipeline
        pts_all, valid_all = dense or self.dense_robot_points(depth, calib)

        def one(pts_c, valid_c, masks_c, det_c, ids_c):
            buf, ovf = voxel_downsample_masks(
                pts_c.reshape(-1, 3), valid_c.reshape(-1),
                masks_c.reshape(masks_c.shape[0], -1),
                p.voxel_size, p.max_points_per_object,
                bound_m=p.dedupe_bound_m,
                stage1_capacity=p.mask_presort_capacity,
                union_capacity=p.max_union_voxels,
                grid_hw=pts_c.shape[:2],
            )
            objs = ObjectSet(
                points=buf.points,
                valid=buf.valid & det_c.valid[:, None],
                class_id=det_c.classes,
                present=det_c.valid & (buf.count > 0),
                track_id=ids_c,
            )
            return objs, jnp.sum(ovf)

        # static per-camera loop, NOT vmap: a vmapped lax.sort gets the
        # batched (C, N) T(2,128) layout that wastes 3/4 of every sublane
        # tile (sort.56 measured 0.68 ms batched vs ~0.02 ms per-camera 1-D)
        return _stack_cams(
            [one(pts_all[c], valid_all[c], masks[c],
                 jax.tree_util.tree_map(lambda x, _c=c: x[_c], det),
                 track_ids[c])
             for c in range(depth.shape[0])]
        )

    def workspace_clouds(
        self, depth: jax.Array, calib: CameraCalib, dense=None
    ) -> Tuple[PointBuffer, jax.Array]:
        """Reference S3 (`vision_pipeline_utils.py:229-254`): strided dense
        cloud -> robot frame -> AABB crop -> voxel dedupe, per camera.

        The strided grid backprojected with stride-scaled intrinsics is
        mathematically identical to sampling the full-resolution
        backprojection at strided pixels, so the dense points are shared
        with the object path when available."""
        p = self.cfg.pipeline
        s = p.workspace_stride
        # accum_skip_prededupe: raw cropped rays go straight through — the
        # accumulator's sorted merge is the (single, global) dedupe, so the
        # per-camera sorts are pure overhead (config.py rationale). Only
        # legal when the grid fits the buffer; with dedupe the capacity
        # bounds UNIQUE voxels instead, so the general path keeps working
        # on any grid size.
        # Workspace SOR statistics are NOT duplicate-invariant (k co-located
        # rays shrink a neighborhood's kNN mean), so raw mode would change
        # which voxels SOR keeps — force the dedupe path when SOR is on.
        raw_ws = (p.workspace_accumulate and p.accum_skip_prededupe
                  and not p.workspace_sor)

        def finish(pts, valid):
            # pts/valid keep the (H, W) image-grid shape: the grid dedupe
            # exploits image-space voxel locality to skip the second
            # full-width compaction sort (see voxel_downsample_grid)
            valid = valid & aabb_mask(
                pts, p.workspace_x_bounds, p.workspace_y_bounds, p.workspace_z_bounds
            )
            if raw_ws and pts.shape[0] * pts.shape[1] <= p.max_points_workspace:
                # snap rays to voxel centers ELEMENTWISE (the skipped work
                # is the dedupe SORT, not the snap): downstream consumers
                # (subtraction min-dist, accumulator merge) must see the
                # same coordinates the dedupe path publishes, or
                # near-threshold voxels flip between the two modes. Same
                # convention as _quantize/_decode_packed: round-half-even
                # index times voxel size.
                fp = pts.reshape(-1, 3).astype(jnp.float32)
                fp = jnp.round(fp / p.voxel_size) * p.voxel_size
                fv = valid.reshape(-1)
                pad = p.max_points_workspace - fv.shape[0]
                if pad:
                    fp = jnp.pad(fp, ((0, pad), (0, 0)))
                    fv = jnp.pad(fv, (0, pad))
                return (
                    PointBuffer(points=jnp.where(fv[:, None], fp, 0.0), valid=fv),
                    jnp.int32(0),
                )
            return voxel_downsample_grid(
                pts, valid, p.voxel_size, p.max_points_workspace,
                bound_m=p.dedupe_bound_m,
            )

        c = depth.shape[0]
        if dense is not None:
            pts_all, valid_all = dense
            # static per-camera loop, NOT vmap (see object_clouds: the
            # batched sort layout costs ~1 ms)
            return _stack_cams(
                [finish(pts_all[i][::s, ::s], valid_all[i][::s, ::s])
                 for i in range(c)]
            )

        # stride FIRST, then backproject with stride-scaled intrinsics
        # (identical math, 1/s^2 of the elementwise+transform work)
        depth_s = strided_grid_downsample(depth, s)

        def one(i):
            xyz, valid = backproject_depth_grid(
                depth_s[i], calib.fx[i] / s, calib.fy[i] / s,
                calib.cx[i] / s, calib.cy[i] / s,
            )
            pts = rigid_transform(xyz, calib.rotation[i], calib.translation[i])
            return finish(pts, valid)

        return _stack_cams([one(i) for i in range(c)])

    def fuse(self, per_cam: ObjectSet) -> Tuple[ObjectSet, PointBuffer, jax.Array]:
        """Reference S6 for two cameras. >2 cameras fold pairwise."""
        p = self.cfg.pipeline
        c = self.cfg.rig.num_cameras
        sets = [jax.tree_util.tree_map(lambda x: x[i], per_cam) for i in range(c)]
        fused = sets[0]
        for other in sets[1:]:
            fused = fuse_centroid(
                fused, other, p.fusion_distance_threshold,
                p.sor_nb_neighbors, p.sor_std_ratio,
            )
        flat, ovf = flatten_objects(fused, capacity=p.max_points_fused_flat)
        return fused, flat, ovf

    def subtract(
        self, workspace: PointBuffer, objects_flat: PointBuffer
    ) -> PointBuffer:
        """Reference S7 (`vision_pipeline_utils.py:322-327`)."""
        return subtract_min_dist(
            workspace, objects_flat, self.cfg.pipeline.subtraction_threshold
        )

    # ------------------------------------------------------------------
    # the fused step
    # ------------------------------------------------------------------

    def step(
        self,
        params,
        state: PipelineState,
        rgb: jax.Array,    # (C, H, W, 3) uint8 BGR
        depth: jax.Array,  # (C, H, W) f32
        calib: CameraCalib,
    ) -> Tuple[PipelineState, FrameOutputs]:
        images = self.preprocess(rgb)
        det, protos, emb = self.detect(params, images)
        state, ids = self.track(state, det, det_emb=emb, images=images)
        masks = self.masks(protos, det)
        # NOTE: the two cloud paths intentionally RECOMPUTE the dense
        # backprojection rather than share it (dense=None): materializing
        # the (C, H, W, 3) f32 points array costs ~3 ms of HBM traffic,
        # while recomputation fuses into each consumer for free
        # (profiler-measured 14.0 vs 17.3 ms/frame).
        per_cam_objs, obj_ovf = self.object_clouds(depth, masks, det, ids, calib)
        ws, ws_ovf = self.workspace_clouds(depth, calib)
        fused, flat, flat_ovf = self.fuse(per_cam_objs)
        ws_all = PointBuffer(
            points=ws.points.reshape(-1, 3), valid=ws.valid.reshape(-1)
        )
        if self.cfg.pipeline.workspace_sor:
            # CPU reference variant SORs the fused workspace cloud
            # (`2cams_mask_cpu.py:530`); workspace scale forbids the exact
            # O(N^2) kernel, so this is the Morton-window approximation.
            keep = sor_inlier_mask_windowed(
                ws_all.points, ws_all.valid,
                self.cfg.pipeline.sor_nb_neighbors,
                self.cfg.pipeline.sor_std_ratio,
            )
            ws_all = PointBuffer(points=ws_all.points, valid=keep)
        ws_out = self.subtract(ws_all, flat)
        acc_ovf = jnp.int32(0)
        if self.cfg.pipeline.workspace_accumulate:
            # persistent TSDF-style workspace memory (stretch config): fold
            # this frame's post-subtraction voxels into the weighted set and
            # publish the accumulated view instead of the per-frame rebuild.
            p = self.cfg.pipeline
            acc, acc_ovf = accumulate_voxels(
                state.accum, ws_out.points, ws_out.valid, p.voxel_size,
                p.dedupe_bound_m, decay=p.accum_decay,
                obs_weight=p.accum_obs_weight,
            )
            state = state.replace(accum=acc)
            ws_out = extract_accumulated(
                acc, p.voxel_size, p.dedupe_bound_m,
                min_weight=p.accum_min_weight,
            )
        out = FrameOutputs(
            detections=det,
            track_ids=ids,
            objects=fused,
            objects_flat=flat,
            workspace=ws_out,
            per_camera_objects=per_cam_objs,
            overflow=jnp.sum(obj_ovf) + jnp.sum(ws_ovf) + flat_ovf + acc_ovf,
        )
        return state, out


    def step_scan(
        self,
        params,
        state: PipelineState,
        rgb: jax.Array,    # (K, C, H, W, 3) uint8 BGR
        depth: jax.Array,  # (K, C, H, W) f32
        calib: CameraCalib,
        good: jax.Array,   # (K,) bool — False frames are skipped
    ) -> Tuple[PipelineState, FrameOutputs]:
        """Throughput mode: K frames per dispatch via `lax.scan`.

        The reference's loop is strictly frame-at-a-time (camera-rate
        bound, `2cams.py:165`); on a recorded replay the dispatch overhead
        of one call per frame dominates once the device step is fast, so
        this amortizes it K ways at the cost of K-1 frames of output
        latency — the same tradeoff as the driver's `pipeline_depth`, but
        for host->device call overhead instead of device occupancy.

        Frames with ``good=False`` neither update the tracker state nor
        count as outputs (the caller masks them), matching the reference's
        error-code `continue` (`2cams.py:174-176`).
        """

        def body(st, xs):
            r, d, g = xs
            new_st, out = self.step(params, st, r, d, calib)
            st2 = jax.tree_util.tree_map(
                lambda a, b: jnp.where(g, a, b), new_st, st
            )
            return st2, out

        return jax.lax.scan(body, state, (rgb, depth, good))


def build_pipeline(cfg: Optional[Config] = None) -> Pipeline:
    cfg = cfg or Config()
    if cfg.tracker.tracker_type not in ("bytetrack", "botsort", "deepsort"):
        raise ValueError(
            f"unknown tracker_type {cfg.tracker.tracker_type!r}; "
            "expected 'bytetrack', 'botsort', or 'deepsort'"
        )
    if cfg.pipeline.workspace_accumulate:
        from rt3d.geometry.ops import packed2_fits

        if not packed2_fits(cfg.pipeline.voxel_size,
                            cfg.pipeline.dedupe_bound_m):
            # the accumulator keys voxels as the TWO-WORD packed pair
            # (sorted-set merge; fits int32 out to ~23 m bounds at 1 mm).
            # Beyond that, refuse rather than corrupt.
            raise ValueError(
                "workspace_accumulate needs the two-word packed voxel "
                f"grid: voxel_size={cfg.pipeline.voxel_size} with "
                f"dedupe_bound_m={cfg.pipeline.dedupe_bound_m} overflows "
                "int32 key words; use a coarser accumulation voxel or a "
                "tighter bound"
            )
    model = YoloSeg(
        variant=cfg.model.variant,
        num_classes=cfg.model.num_classes,
        num_mask_coeffs=cfg.model.num_mask_coeffs,
        input_hw=cfg.model.input_hw,
    )
    return Pipeline(cfg=cfg, model=model)
