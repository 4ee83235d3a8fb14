"""Multi-device tests on the virtual 8-device CPU mesh: camera-sharded
pipeline step, fsdp train step, and graft entry dryrun."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.tiny import H, W, tiny_config

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs the 8-device CPU mesh"
)


def test_sharded_step_matches_single_device():
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.parallel.mesh import make_mesh
    from rt3d.parallel.multicam import make_sharded_step
    from rt3d.pipeline.step import CameraCalib, build_pipeline

    cfg = tiny_config(num_cameras=2)
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(H, W))
    pkt = src.get(0)
    rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)

    mesh = make_mesh({"cam": 2})
    sharded = make_sharded_step(pipe, mesh)
    st_s, out_s = sharded(params, pipe.init_state(), rgb, depth, calib)

    st_1, out_1 = jax.jit(pipe.step)(params, pipe.init_state(), rgb, depth, calib)

    np.testing.assert_array_equal(
        np.asarray(out_s.workspace.valid), np.asarray(out_1.workspace.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out_s.objects_flat.points),
        np.asarray(out_1.objects_flat.points),
        atol=1e-5,
    )
    np.testing.assert_array_equal(
        np.asarray(out_s.track_ids), np.asarray(out_1.track_ids)
    )


def test_sharded_step_accepts_quantized_params():
    """The params in_spec is a pytree PREFIX (plain P()), so the sharded
    step takes ANY replicated params structure — including a quantized
    dict's kernel_q8/kernel_scale/act_scale triples — and must match the
    single-device step run on the same quantized params bit-for-bit."""
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.models.yolo import quant
    from rt3d.parallel.mesh import make_mesh
    from rt3d.parallel.multicam import make_sharded_step
    from rt3d.pipeline.step import CameraCalib, build_pipeline

    cfg = tiny_config(num_cameras=2)
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(H, W))
    pkt = src.get(0)
    rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)

    # random-init activations decay with depth; calibrate on the real
    # frame and keep whatever clears the act-scale floor (stem excluded)
    qparams = quant.quantize_params(
        pipe.model, params, [pipe.preprocess(rgb)],
        exclude=lambda p: p.split("/")[0] == "0")
    assert any(k.endswith("/kernel_q8") for k in qparams)

    mesh = make_mesh({"cam": 2})
    sharded = make_sharded_step(pipe, mesh)
    st_s, out_s = sharded(qparams, pipe.init_state(), rgb, depth, calib)
    st_1, out_1 = jax.jit(pipe.step)(
        qparams, pipe.init_state(), rgb, depth, calib)

    np.testing.assert_array_equal(
        np.asarray(out_s.workspace.valid), np.asarray(out_1.workspace.valid)
    )
    np.testing.assert_allclose(
        np.asarray(out_s.objects_flat.points),
        np.asarray(out_1.objects_flat.points),
        atol=1e-5,
    )


def _moderate_stretch_config(num_cameras=4):
    """The STRETCH configuration (BASELINE configs[4]) at moderate frame
    shape: 4 cameras, 1 mm voxels (two-word packed keys), persistent
    accumulation with the raw-ray skip-prededupe path — the exact feature
    set `bench.py` runs as RT3D_BENCH_CAMS=4 RT3D_BENCH_VOXEL_MM=1
    RT3D_BENCH_ACCUM=1, here meeting the camera-sharded parallel path."""
    import dataclasses

    from rt3d.config import (
        CameraConfig, Config, Extrinsics, Intrinsics, ModelConfig,
        PipelineConfig, RigConfig, TrackerConfig,
    )

    h, w = 180, 320
    intr = Intrinsics(fx=176.0, fy=176.0, cx=w / 2, cy=h / 2,
                      width=w, height=h)
    cams = []
    for i in range(num_cameras):
        off = (i - (num_cameras - 1) / 2) * 0.08
        cams.append(CameraConfig(
            name=f"cam{i+1}", intrinsics=intr,
            extrinsics=Extrinsics(
                rotation=((1.0, 0.0, 0.0), (0.0, -1.0, 0.0),
                          (0.0, 0.0, -1.0)),
                translation=(0.25 + off, 0.6, 1.0),
            ),
        ))
    return Config(
        rig=RigConfig(cameras=tuple(cams)),
        model=ModelConfig(variant="n", input_hw=(96, 160), max_detections=4,
                          nms_pre_topk=16, conf_thresh=0.05,
                          class_filter=()),
        tracker=TrackerConfig(max_tracks=16),
        pipeline=PipelineConfig(
            voxel_size=0.001,                      # 1 mm => two-word keys
            max_points_per_object=256, max_points_fused_object=512,
            max_points_workspace=16384,            # >= (h/2)*(w/2) rays
            max_points_workspace_fused=65536,
            max_objects_fused=8,
            workspace_accumulate=True, accum_capacity=65536,
            accum_skip_prededupe=True,
        ),
    )


@pytest.mark.slow
def test_stretch_config_through_sharded_step():
    """VERDICT r3 #5: the accumulating 4-cam @ 1 mm stretch config through
    `make_sharded_step` — multi-frame bit-identity vs the single-device
    step, INCLUDING the carried accumulator state."""
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.parallel.mesh import make_mesh
    from rt3d.parallel.multicam import make_sharded_step
    from rt3d.pipeline.step import CameraCalib, build_pipeline

    if len(jax.devices()) < 4:
        pytest.skip("needs 4 devices")
    cfg = _moderate_stretch_config(num_cameras=4)
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=4, num_frames=3, hw=(180, 320),
                          num_objects=2)

    mesh = make_mesh({"cam": 4})
    sharded = make_sharded_step(pipe, mesh)
    single = jax.jit(pipe.step)

    st_s, st_1 = pipe.init_state(), pipe.init_state()
    for f in range(2):
        pkt = src.get(f)
        rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)
        st_s, out_s = sharded(params, st_s, rgb, depth, calib)
        st_1, out_1 = single(params, st_1, rgb, depth, calib)
        np.testing.assert_array_equal(
            np.asarray(out_s.workspace.valid),
            np.asarray(out_1.workspace.valid), err_msg=f"frame {f}")
        np.testing.assert_allclose(
            np.asarray(out_s.workspace.points),
            np.asarray(out_1.workspace.points), atol=1e-6,
            err_msg=f"frame {f}")
        np.testing.assert_allclose(
            np.asarray(out_s.objects_flat.points),
            np.asarray(out_1.objects_flat.points), atol=1e-5)
        assert int(out_s.overflow) == int(out_1.overflow) == 0
        # the replicated accumulator state itself stays bit-identical
        for a, b in zip(jax.tree_util.tree_leaves(st_s.accum),
                        jax.tree_util.tree_leaves(st_1.accum)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fsdp_train_step_runs_and_shards():
    import optax

    from rt3d.models.yolo.model import YoloSeg
    from rt3d.parallel.mesh import make_mesh
    from rt3d.train.step import make_train_step

    mesh = make_mesh({"dp": 2, "fsdp": 2})
    model = YoloSeg(variant="n", num_classes=4, input_hw=(64, 96))
    init_fn, step_fn = make_train_step(model, optax.sgd(1e-3), mesh=mesh)
    state = init_fn(jax.random.PRNGKey(0))

    # at least one parameter is actually sharded over fsdp
    shardings = [
        p.sharding for p in jax.tree_util.tree_leaves(state.params)
        if hasattr(p, "sharding")
    ]
    assert any("fsdp" in str(s.spec) for s in shardings)

    a = model.num_anchors
    b = 4
    batch = {
        "images": jnp.zeros((b, 64, 96, 3), jnp.float32),
        "cls": jnp.zeros((b, a, 4), jnp.float32),
        "box": jnp.ones((b, a, 4), jnp.float32),
        "box_w": jnp.ones((b, a), jnp.float32),
        "mask": jnp.zeros((b, 16, 24), jnp.float32),
    }
    state, metrics = step_fn(state, batch)
    l1 = float(metrics["loss"])
    state, metrics = step_fn(state, batch)
    l2 = float(metrics["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l2 < l1  # sgd decreases this smooth objective
    assert int(state.step) == 2


def test_graft_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(min(len(jax.devices()), 4))
