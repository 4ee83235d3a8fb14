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


def test_one_mm_voxel_uses_lex_fallback(rng):
    """1 mm voxels with the default ±2.56 m bound exceed int32 packing —
    the lexicographic multi-key path must engage with identical semantics."""
    from rt3d.geometry.ops import packed_fits, voxel_downsample
    from tests import oracles

    assert not packed_fits(0.001, 2.56)
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
