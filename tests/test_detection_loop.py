"""Golden tests for the CLOSED detection loop: the model's OWN detections
(trained weights artifact, `tools/train_synth.py`) drive mask prediction
and 3D reconstruction — no oracle masks injected anywhere.

This is the chain the reference's output quality lives in
(`2cam/2cams_mask_gpu.py:272-375`: model.track -> masks -> object clouds)
and the one thing round-2 artifacts never proved. The weights ship in
`weights/yolo11n_synth_seg.npz` (fp16, ~5 MB) with a manifest recording
the training recipe and eval scores.
"""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

WEIGHTS = os.path.join(os.path.dirname(__file__), "..", "weights",
                       "yolo11n_synth_seg.npz")

pytestmark = pytest.mark.skipif(
    not os.path.exists(WEIGHTS),
    reason="trained weights artifact missing (run tools/train_synth.py)",
)


@pytest.fixture(scope="module")
def trained_pipe():
    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.models.yolo.convert import load_params
    from rt3d.pipeline.step import build_pipeline

    with open(os.path.splitext(WEIGHTS)[0] + ".json") as f:
        manifest = json.load(f)
    cfg = reference_2cam_config()
    cfg = dataclasses.replace(
        cfg,
        model=dataclasses.replace(
            cfg.model,
            variant=manifest["variant"],
            input_hw=tuple(manifest["input_hw"]),
            conf_thresh=0.25,
        ),
    )
    src = SyntheticSource(num_cameras=2, num_frames=None, hw=(720, 1280),
                          num_objects=2, seed=4242)
    cfg = with_cameras(cfg, src.cameras())
    pipe = build_pipeline(cfg)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in load_params(WEIGHTS).items()}
    return pipe, params, src, manifest


def test_manifest_records_passing_eval(trained_pipe):
    """The artifact carries its own training-time eval; it must have been
    saved in a detection-capable state."""
    _, _, _, manifest = trained_pipe
    assert manifest["eval"]["recall"] >= 0.9, manifest["eval"]
    assert manifest["eval"]["mean_iou"] >= 0.7, manifest["eval"]


def test_predicted_masks_match_ground_truth(trained_pipe):
    """Forward -> NMS -> retina masks with the model's own weights:
    every gt instance is found with mask IoU >= 0.7 (scene family held out
    from training by seed)."""
    from tools.eval_synth import mask_iou

    pipe, params, src, _ = trained_pipe
    detect = jax.jit(pipe.detect)
    masks_fn = jax.jit(pipe.masks)

    total, found, ious = 0, 0, []
    for frame in (0, 37):
        pkt = src.get(frame)
        gt = src.gt_masks(frame)  # (C, N, H, W)
        images = pipe.preprocess(jnp.asarray(pkt.rgb))
        det, protos, _ = detect(params, images)
        pred = np.asarray(masks_fn(protos, det))
        valid = np.asarray(det.valid)
        for c in range(2):
            for k in range(gt.shape[1]):
                if gt[c, k].sum() < 16:
                    continue
                total += 1
                best = max(
                    (mask_iou(gt[c, k], pred[c, d])
                     for d in range(pred.shape[1]) if valid[c, d]),
                    default=0.0,
                )
                ious.append(best)
                if best >= 0.7:
                    found += 1
    assert total >= 4
    assert found == total, (found, total, ious)


def test_model_detections_reconstruct_objects(trained_pipe):
    """The full step with trained weights: object clouds built from MODEL
    detections match the clouds built from ORACLE masks within voxel
    tolerance, and centroids sit at the true object positions."""
    pipe, params, src, _ = trained_pipe
    cfg = pipe.cfg
    from rt3d.models.yolo.postprocess import Detections
    from rt3d.pipeline.step import CameraCalib

    calib = CameraCalib.from_config(cfg)
    frame = 11
    pkt = src.get(frame)
    rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)

    # model-driven: the real fused step
    state = pipe.init_state()
    state, out = jax.jit(pipe.step)(params, state, rgb, depth, calib)
    model_objs = out.per_camera_objects

    # oracle-driven: analytic masks through the same geometry stages
    gt = src.gt_masks(frame)  # (C, N, H, W)
    d = cfg.model.max_detections
    n_obj = gt.shape[1]
    om = np.zeros((2, d, 720, 1280), bool)
    om[:, :n_obj] = gt
    det = Detections(
        boxes=jnp.zeros((2, d, 4)),
        scores=jnp.zeros((2, d)).at[:, :n_obj].set(0.9),
        classes=jnp.full((2, d), 39, jnp.int32),
        coeffs=jnp.zeros((2, d, cfg.model.num_mask_coeffs)),
        valid=jnp.zeros((2, d), bool).at[:, :n_obj].set(True),
    )
    ids = jnp.full((2, d), -1, jnp.int32)
    oracle_objs, _ = jax.jit(pipe.object_clouds)(
        depth, jnp.asarray(om), det, ids, calib)

    centers = src.object_centers(frame)
    for c in range(2):
        mpts = np.asarray(model_objs.points[c])
        mval = np.asarray(model_objs.valid[c]
                          & model_objs.present[c][:, None])
        model_pts = mpts[mval]
        opts = np.asarray(oracle_objs.points[c])
        oval = np.asarray(oracle_objs.valid[c]
                          & oracle_objs.present[c][:, None])
        oracle_pts = opts[oval]
        assert len(model_pts) > 40 and len(oracle_pts) > 40
        # chamfer: every model point near an oracle point and vice versa,
        # within 2 voxels (mask-boundary wobble at object edges)
        tol = 2.0 * cfg.pipeline.voxel_size
        d2 = ((model_pts[:, None] - oracle_pts[None]) ** 2).sum(-1)
        assert float(np.sqrt(d2.min(1)).mean()) < tol
        assert float(np.sqrt(d2.min(0)).mean()) < tol

        # per-object centroids at the true (x, y) positions
        present = np.asarray(model_objs.present[c])
        got = []
        for s in np.nonzero(present)[0]:
            v = np.asarray(model_objs.valid[c, s])
            if v.sum() > 20:
                got.append(np.asarray(model_objs.points[c, s])[v].mean(0))
        assert len(got) == len(centers)
        for ctr in centers:
            best = min(np.linalg.norm(g[:2] - ctr[:2]) for g in got)
            assert best < 0.05, (ctr, got)
