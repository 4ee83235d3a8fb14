"""Scaling-axis coverage: 4-camera fusion, 1 mm voxel fallback, checkpoint
round-trips (the BASELINE.json stretch configs)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.tiny import H, W, tiny_config


def test_four_camera_pipeline_and_fusion():
    """4-camera rig: pairwise fusion folding (SURVEY §2.3 / stretch cfg)."""
    from rt3d.config import RigConfig
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import CameraCalib, build_pipeline

    base = tiny_config(num_cameras=2)
    cams = tuple(
        dataclasses.replace(base.rig.cameras[i % 2], name=f"cam{i+1}")
        for i in range(4)
    )
    cfg = dataclasses.replace(base, rig=RigConfig(cameras=cams))
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=4, num_frames=2, hw=(H, W))
    pkt = src.get(0)
    state = pipe.init_state()
    state, out = jax.jit(pipe.step)(
        params, state, jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth), calib
    )
    # fused slot capacity folds pairwise: ((d+d)+d)+d = 4d slots
    assert out.objects.points.shape[0] == 4 * cfg.model.max_detections
    assert out.workspace.points.shape[0] == 4 * cfg.pipeline.max_points_workspace
    assert int(out.workspace.count) > 400


def test_one_mm_voxel_uses_two_word_packed(rng):
    """1 mm voxels with the default ±2.56 m bound exceed single-word int32
    packing — the TWO-WORD packed path must engage with identical
    semantics (2-operand sort instead of the 3-key lex fallback)."""
    from rt3d.geometry.ops import packed_fits, packed2_fits, voxel_downsample
    from tests import oracles

    assert not packed_fits(0.001, 2.56)
    assert packed2_fits(0.001, 2.56)
    assert packed_fits(0.005, 2.56)

    pts = rng.uniform(-0.2, 0.2, (500, 3)).astype(np.float32)
    pts = np.vstack([pts, pts[:100]])
    valid = np.ones(len(pts), bool)
    buf, ovf = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid),
                                0.001, 1024, bound_m=2.56)
    got = np.asarray(buf.points)[np.asarray(buf.valid)]
    expect = oracles.voxel_downsample_oracle(pts, 0.001)
    assert int(ovf) == 0
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-7)


def test_one_mm_voxel_capacity_pressure(rng):
    """Two-word path UNDER capacity pressure: the masked-re-sort compaction
    must keep exactly the lexicographically smallest `capacity` voxels and
    count the rest as overflow (capacity < unique forces the compaction
    branch, not the capacity>=n in-place fast path)."""
    from rt3d.geometry.ops import voxel_downsample
    from tests import oracles

    pts = rng.uniform(-0.4, 0.4, (600, 3)).astype(np.float32)
    pts = np.vstack([pts, pts[:120]])  # duplicates keep dedupe honest
    valid = np.ones(len(pts), bool)
    valid[-30:] = False
    expect_all = oracles.voxel_downsample_oracle(pts[valid], 0.001)
    cap = len(expect_all) // 2
    buf, ovf = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid),
                                0.001, cap, bound_m=2.56)
    got = np.asarray(buf.points)[np.asarray(buf.valid)]
    assert int(ovf) == len(expect_all) - cap
    np.testing.assert_allclose(got, expect_all[:cap], rtol=1e-5, atol=1e-7)


def test_one_mm_voxel_packed_with_tight_bounds(rng):
    """1 mm voxels DO pack with a tighter bound (e.g. a 0.6 m cell)."""
    from rt3d.geometry.ops import packed_fits, voxel_downsample
    from tests import oracles

    assert packed_fits(0.001, 0.6)
    pts = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
    buf, ovf = voxel_downsample(jnp.asarray(pts), jnp.ones(400, bool),
                                0.001, 512, bound_m=0.6)
    got = np.asarray(buf.points)[np.asarray(buf.valid)]
    expect = oracles.voxel_downsample_oracle(pts, 0.001)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-7)


def test_one_mm_masks_two_word_parity(rng):
    """The batched masks dedupe at 1 mm (two-word packed path) must match
    per-mask oracle downsamples exactly."""
    from rt3d.geometry.ops import voxel_downsample_masks
    from tests import oracles

    n, d = 3000, 5
    pts = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    pts[1000:1500] = pts[:500]  # cross-mask duplicates
    valid = rng.uniform(size=n) > 0.1
    masks = rng.uniform(size=(d, n)) > 0.6
    buf, ovf = voxel_downsample_masks(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(masks),
        0.001, 2048, bound_m=2.56,
    )
    assert np.all(np.asarray(ovf) == 0)
    for k in range(d):
        got = np.asarray(buf.points[k])[np.asarray(buf.valid[k])]
        sel = masks[k] & valid
        expect = oracles.voxel_downsample_oracle(pts[sel], 0.001)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-7)


def test_one_mm_subtract_voxel_sets(rng):
    """Voxel-set subtraction at 1 mm: the single-word key would silently
    alias cells; the two-word path must match a python set-difference."""
    from rt3d.geometry.ops import PointBuffer
    from rt3d.geometry.voxel_sets import subtract_voxel_sets

    ws = rng.uniform(-0.4, 0.4, (800, 3)).astype(np.float32)
    objs = np.vstack([ws[100:200] + rng.normal(0, 2e-5, (100, 3)),
                      rng.uniform(-0.4, 0.4, (50, 3))]).astype(np.float32)
    wsv = np.ones(800, bool)
    obv = np.ones(150, bool)
    out = subtract_voxel_sets(
        PointBuffer(points=jnp.asarray(ws), valid=jnp.asarray(wsv)),
        PointBuffer(points=jnp.asarray(objs), valid=jnp.asarray(obv)),
        0.001,
    )

    def cells(p):
        return set(map(tuple, np.round(p / 0.001).astype(np.int64)))

    poisoned = cells(objs)
    expect_keep = np.array([tuple(c) not in poisoned
                            for c in np.round(ws / 0.001).astype(np.int64)])
    np.testing.assert_array_equal(np.asarray(out.valid), expect_keep)


def test_one_mm_accumulator(rng):
    """Persistent accumulation at 1 mm (the BASELINE stretch config pairs
    1 mm with accumulation — previously refused at build time)."""
    from rt3d.geometry.voxel_sets import (
        VoxelAccumulator, accumulate_voxels, extract_accumulated,
    )

    pts = rng.uniform(-0.2, 0.2, (300, 3)).astype(np.float32)
    uniq = np.unique(np.round(pts / 0.001), axis=0)
    acc = VoxelAccumulator.empty(1024)
    for _ in range(2):
        acc, ovf = accumulate_voxels(acc, jnp.asarray(pts),
                                     jnp.ones(300, bool), 0.001,
                                     decay=0.9, obs_weight=1.0)
        assert int(ovf) == 0
    out = extract_accumulated(acc, 0.001, min_weight=1.5)
    got = np.asarray(out.points)[np.asarray(out.valid)]
    # every voxel seen twice: weight = 1*0.9 + 1 = 1.9 >= 1.5
    assert got.shape[0] == uniq.shape[0]
    np.testing.assert_allclose(
        np.sort(got, axis=0), np.sort(uniq * 0.001, axis=0),
        rtol=1e-5, atol=1e-7,
    )


def test_one_mm_accumulate_pipeline_builds():
    """build_pipeline accepts accumulate + 1 mm now (two-word keys) and a
    step executes."""
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import CameraCalib, build_pipeline

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg, pipeline=dataclasses.replace(
            cfg.pipeline, voxel_size=0.001, workspace_accumulate=True,
            accum_capacity=8192,
        ),
    )
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=1, hw=(H, W))
    pkt = src.get(0)
    state, out = jax.jit(pipe.step)(
        params, pipe.init_state(), jnp.asarray(pkt.rgb),
        jnp.asarray(pkt.depth), calib)
    assert int(out.workspace.count) > 0
    assert int(np.asarray(state.accum.keys_hi != np.iinfo(np.int32).max).sum()) > 0


def test_pipeline_state_checkpoint_roundtrip(tmp_path):
    """Tracker/pipeline state survives save -> load -> continue
    (SURVEY §5: the reference has NO checkpointing; state hides in
    ultralytics `persist=True`)."""
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import CameraCalib, build_pipeline
    from rt3d.runtime.checkpoint import load_pytree, save_pytree

    cfg = tiny_config()
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=4, hw=(H, W))
    step = jax.jit(pipe.step)

    state = pipe.init_state()
    for i in range(2):
        pkt = src.get(i)
        state, _ = step(params, state, jnp.asarray(pkt.rgb),
                        jnp.asarray(pkt.depth), calib)

    ckpt = str(tmp_path / "state.npz")
    save_pytree(ckpt, state)
    restored = load_pytree(ckpt, pipe.init_state())
    assert int(restored.tracker.frame_id[0]) == 2
    np.testing.assert_array_equal(
        np.asarray(restored.tracker.track_id), np.asarray(state.tracker.track_id)
    )

    # both continue identically
    pkt = src.get(2)
    s1, o1 = step(params, state, jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth), calib)
    s2, o2 = step(params, restored, jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth), calib)
    np.testing.assert_array_equal(np.asarray(o1.track_ids), np.asarray(o2.track_ids))
    np.testing.assert_array_equal(
        np.asarray(o1.workspace.valid), np.asarray(o2.workspace.valid)
    )


def test_params_checkpoint_roundtrip(tmp_path):
    from rt3d.models.yolo.convert import load_params, save_params
    from rt3d.models.yolo.model import YoloSeg

    model = YoloSeg(variant="n", input_hw=(64, 96))
    params = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "p.npz")
    save_params({k: np.asarray(v) for k, v in params.items()}, path)
    loaded = load_params(path)
    assert set(loaded) == set(params)
    np.testing.assert_allclose(loaded["0/conv/kernel"], params["0/conv/kernel"])
