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
