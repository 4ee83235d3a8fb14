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


# Per-variant manifest bars (held-out HARD-family eval, tools/eval_synth):
# x is the flagship/benched artifact and carries the headline capability
# claim; n is the CI workhorse (2.9M params — its measured plateau is
# recorded in NOTES.md round-4 campaign table); l drives the 1cam preset.
MANIFEST_BARS = {
    "n": {"recall": 0.85, "mean_iou": 0.70, "precision": 0.35,
          "easy_recall": 0.95, "easy_precision": 0.70},
    "l": {"recall": 0.85, "mean_iou": 0.70, "precision": 0.25,
          "easy_recall": 0.95, "easy_precision": 0.75},
    # flagship: round-5 three-campaign resume (fresh-scene fine-tunes,
    # NOTES.md round-5 table). The shipped c3 manifest eval (10 hard
    # frames, seed 780): recall 1.0 / mIoU 0.837 / precision 0.689
    # @0.25 -> 0.724 @0.8, easy 1.0/1.0. Single-10-frame evals swing
    # +-0.08 in precision between seeds (c2 measured 0.80 on seed 778
    # and 0.69 on 777), so bars pin floors that survive retrain noise;
    # the monotone progress gauge is the 30-frame robust eval
    # (runs_chip/r5/eval_x_*_seed900_30f: precision 0.55 -> 0.65 @0.25,
    # 0.69 -> 0.80 @0.8 across rounds 4->5), and NOTES.md records the
    # spread vs the 0.9 target explicitly.
    "x": {"recall": 0.93, "mean_iou": 0.78, "precision": 0.65,
          "precision_at_08": 0.70,
          "easy_recall": 0.95, "easy_precision": 0.90},
}


@pytest.mark.parametrize("variant", ["n", "l", "x"])
def test_manifest_records_passing_eval(variant):
    """Every shipped artifact carries its own held-out eval; it must have
    been saved in a detection-capable state — on the HARD family
    (occlusion/clutter/distractors), with precision measured (VERDICT r3
    #1-2: recall-only eval on easy scenes cannot see phantom
    detections). Pure manifest read — no model forward."""
    path = os.path.join(os.path.dirname(__file__), "..", "weights",
                        f"yolo11{variant}_synth_seg.json")
    if not os.path.exists(path):
        pytest.skip(f"no {variant} artifact")
    with open(path) as f:
        manifest = json.load(f)
    bars = MANIFEST_BARS[variant]
    ev = manifest["eval"]
    assert ev["domain"] == "hard", ev
    assert ev["recall"] >= bars["recall"], ev
    assert ev["mean_iou"] >= bars["mean_iou"], ev
    assert ev["precision"] >= bars["precision"], ev
    if "precision_at_08" in bars:
        assert ev["by_conf"]["0.8"]["precision"] >= bars["precision_at_08"], ev
    ez = manifest["eval_easy"]
    assert ez["recall"] >= bars["easy_recall"], ez
    assert ez["precision"] >= bars["easy_precision"], ez


@pytest.fixture(scope="module")
def hard_scene_pipe():
    """Trained pipeline over a HARD-domain 2-camera scene (3 targets +
    seeded distractors), held out from training by seed."""
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
            cfg.model, variant=manifest["variant"],
            input_hw=tuple(manifest["input_hw"]), conf_thresh=0.25,
        ),
    )
    # conf 0.6 = the precision-oriented operating point for the phantom
    # bound below (TP scores sit >=0.9 for the trained artifacts — the
    # manifest's by_conf curve records the recall cost: none for n)
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, conf_thresh=0.6))
    src = SyntheticSource(num_cameras=2, num_frames=None, hw=(720, 1280),
                          num_objects=3, seed=990007, domain="hard")
    cfg = with_cameras(cfg, src.cameras())
    pipe = build_pipeline(cfg)
    params = {k: jnp.asarray(v, jnp.float32)
              for k, v in load_params(WEIGHTS).items()}
    return pipe, params, src


def test_no_phantom_object_clouds_hard_sequence(hard_scene_pipe):
    """VERDICT r3 #2 golden: across a multi-frame hard-domain sequence
    (occlusion + clutter + distractors), reconstructed per-camera object
    slots holding >20 points sit at true target positions — phantom
    detections (ghosts, duplicates surviving NMS, bottles fired on books)
    would materialize as clouds with no GT object under them. The n
    workhorse artifact is held to a phantom BOUND (<=2 slots across the
    16 camera-frames at the conf-0.6 operating point) rather than zero —
    its measured hard-set FP profile is in the manifest's by_conf curve;
    the flagship x artifact's stricter precision rides
    test_manifest_records_passing_eval. Targets that are well visible
    must actually be reconstructed."""
    pipe, params, src = hard_scene_pipe
    from rt3d.pipeline.step import CameraCalib

    calib = CameraCalib.from_config(pipe.cfg)
    step = jax.jit(pipe.step)
    state = pipe.init_state()
    phantoms, found, expected = [], 0, 0
    for frame in range(0, 24, 3):
        pkt = src.get(frame)
        state, out = step(params, state, jnp.asarray(pkt.rgb),
                          jnp.asarray(pkt.depth), calib)
        centers = src.object_centers(frame)       # (N, 3) targets
        vis = src.visible_fraction(frame)         # (C, N)
        for c in range(2):
            slot_centroids = []
            for s in np.nonzero(np.asarray(out.per_camera_objects.present[c]))[0]:
                v = np.asarray(out.per_camera_objects.valid[c, s])
                if v.sum() <= 20:
                    continue
                ctr = np.asarray(out.per_camera_objects.points[c, s])[v].mean(0)
                slot_centroids.append(ctr)
                d = np.linalg.norm(centers[:, :2] - ctr[None, :2], axis=1)
                if d.min() > 0.10:
                    phantoms.append((frame, c, int(s), ctr.tolist(),
                                     float(d.min())))
            for k in range(len(centers)):
                if vis[c, k] < 0.7:
                    continue   # occluded/out of view: no claim
                expected += 1
                if slot_centroids and min(
                        np.linalg.norm(ctr[:2] - centers[k][:2])
                        for ctr in slot_centroids) < 0.10:
                    found += 1
    assert len(phantoms) <= 2, f"phantom object clouds: {phantoms}"
    assert found >= 0.85 * expected, (found, expected)


def test_partial_occlusion_frame_reconstructs(hard_scene_pipe):
    """VERDICT r3 #1 done-bar: a PARTIALLY occluded target (25-70% of its
    pixels hidden behind another object) is still detected and its visible
    surface reconstructed at the true position."""
    pipe, params, src = hard_scene_pipe
    from rt3d.pipeline.step import CameraCalib

    # locate a genuine partial-occlusion event analytically
    pick = None
    for f in range(0, 120, 2):
        vis = src.visible_fraction(f)
        cands = np.argwhere((vis > 0.3) & (vis < 0.75))
        if len(cands):
            pick = (f, int(cands[0][0]), int(cands[0][1]))
            break
    assert pick is not None, "scene family lost its occlusion events"
    frame, c, k = pick

    calib = CameraCalib.from_config(pipe.cfg)
    pkt = src.get(frame)
    state, out = jax.jit(pipe.step)(
        params, pipe.init_state(), jnp.asarray(pkt.rgb),
        jnp.asarray(pkt.depth), calib)
    target = src.object_centers(frame)[k]
    best = np.inf
    for s in np.nonzero(np.asarray(out.per_camera_objects.present[c]))[0]:
        v = np.asarray(out.per_camera_objects.valid[c, s])
        if v.sum() <= 20:
            continue
        ctr = np.asarray(out.per_camera_objects.points[c, s])[v].mean(0)
        best = min(best, float(np.linalg.norm(ctr[:2] - target[:2])))
    assert best < 0.12, (
        f"occluded target (frame {frame} cam {c} vis "
        f"{src.visible_fraction(frame)[c, k]:.2f}) not reconstructed; "
        f"nearest cloud {best:.3f} m away")


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
