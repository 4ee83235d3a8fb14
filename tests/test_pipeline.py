"""End-to-end pipeline step tests on a tiny config + synthetic scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt3d.io.synthetic import SyntheticSource
from rt3d.pipeline.step import CameraCalib, build_pipeline
from tests.tiny import H, W, tiny_config


@pytest.fixture(scope="module")
def pipe_and_params():
    cfg = tiny_config()
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    return pipe, params


def test_fused_step_runs_and_shapes(pipe_and_params):
    pipe, params = pipe_and_params
    cfg = pipe.cfg
    src = SyntheticSource(num_cameras=2, num_frames=4, hw=(H, W))
    calib = CameraCalib.from_config(cfg)
    state = pipe.init_state()
    step = jax.jit(pipe.step)

    pkt = src.get(0)
    state, out = step(params, state, jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth), calib)
    d = cfg.model.max_detections
    assert out.detections.boxes.shape == (2, d, 4)
    assert out.track_ids.shape == (2, d)
    assert out.objects.points.shape[0] == 2 * d  # fused slot capacity
    assert out.workspace.points.shape == (2 * cfg.pipeline.max_points_workspace, 3)
    # workspace should see the synthetic table: plenty of voxels
    assert int(out.workspace.count) > 200
    # second frame reuses the compiled step and keeps state moving
    pkt = src.get(1)
    state, out2 = step(params, state, jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth), calib)
    assert int(state.tracker.frame_id[0]) == 2


def test_masks_bf16_resize_config_plumbing():
    """ModelConfig.mask_resize_dtype='bfloat16' flows through
    Pipeline.masks (vmap + erode wiring) and yields the same bool masks
    up to the documented <=1 px boundary band (numerics pinned by
    tests/test_yolo_model.py; this pins the config-to-op plumbing)."""
    import dataclasses

    from rt3d.models.yolo.postprocess import Detections

    base = tiny_config()
    rng = np.random.default_rng(1)
    d = base.model.max_detections
    nm = base.model.num_mask_coeffs
    hp, wp = base.model.input_hw[0] // 4, base.model.input_hw[1] // 4
    protos = jnp.asarray(rng.normal(0.0, 2.0, (2, hp, wp, nm)), jnp.float32)
    det = Detections(
        boxes=jnp.asarray(
            rng.uniform(0, [W // 2, H // 2, W, H], (2, d, 4)), jnp.float32),
        scores=jnp.ones((2, d), jnp.float32),
        classes=jnp.zeros((2, d), jnp.int32),
        coeffs=jnp.asarray(rng.normal(0.0, 1.0, (2, d, nm)), jnp.float32),
        valid=jnp.ones((2, d), bool),
    )
    outs = {}
    for dt in ("float32", "bfloat16"):
        cfg = dataclasses.replace(
            base, model=dataclasses.replace(base.model, mask_resize_dtype=dt))
        pipe = build_pipeline(cfg)
        outs[dt] = np.asarray(jax.jit(pipe.masks)(protos, det))
    assert outs["float32"].shape == (2, d, H, W)
    assert outs["float32"].dtype == bool
    flips = outs["float32"] ^ outs["bfloat16"]
    assert flips.mean() < 0.01


def test_oracle_mask_object_reconstruction(pipe_and_params):
    """Bypass the (random-weight) detector: feed ground-truth masks through
    the geometry stages and check the reconstructed object."""
    pipe, params = pipe_and_params
    cfg = pipe.cfg
    src = SyntheticSource(num_cameras=2, num_frames=4, hw=(H, W), num_objects=1)
    calib = CameraCalib.from_config(cfg)

    pkt = src.get(0)
    gt = src.gt_masks(0)  # (C, N, H, W)
    d = cfg.model.max_detections
    masks = np.zeros((2, d, H, W), bool)
    masks[:, 0] = gt[:, 0]

    from rt3d.models.yolo.postprocess import Detections

    det = Detections(
        boxes=jnp.zeros((2, d, 4)),
        scores=jnp.zeros((2, d)).at[:, 0].set(0.9),
        classes=jnp.zeros((2, d), jnp.int32).at[:, 0].set(39),
        coeffs=jnp.zeros((2, d, cfg.model.num_mask_coeffs)),
        valid=jnp.zeros((2, d), bool).at[:, 0].set(True),
    )
    ids = jnp.full((2, d), -1, jnp.int32).at[:, 0].set(1)

    objs, ovf = jax.jit(pipe.object_clouds)(
        jnp.asarray(pkt.depth), jnp.asarray(masks), det, ids, calib
    )
    # camera-0 object cloud: centred near the true object centre
    pts0 = np.asarray(objs.points[0][0])[np.asarray(objs.valid[0][0])]
    assert len(pts0) > 20
    true_c = src.object_centers(0)[0]
    got_c = pts0.mean(axis=0)
    np.testing.assert_allclose(got_c[:2], true_c[:2], atol=0.05)
    # box top is at z = sz; mask-visible surface is the top face
    assert abs(got_c[2] - 0.12) < 0.03

    fused, flat, _ = jax.jit(pipe.fuse)(objs)
    assert int(np.asarray(fused.present).sum()) == 1  # 1-v-1 fused

    ws, _ = jax.jit(pipe.workspace_clouds)(jnp.asarray(pkt.depth), calib)
    from rt3d.geometry.ops import PointBuffer

    ws_all = PointBuffer(points=ws.points.reshape(-1, 3), valid=ws.valid.reshape(-1))
    before = int(ws_all.count)
    ws_out = jax.jit(pipe.subtract)(ws_all, flat)
    after = int(ws_out.count)
    assert after <= before


def test_pipeline_determinism(pipe_and_params):
    pipe, params = pipe_and_params
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(H, W))
    calib = CameraCalib.from_config(pipe.cfg)
    step = jax.jit(pipe.step)
    pkt = src.get(0)
    rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)
    _, out1 = step(params, pipe.init_state(), rgb, depth, calib)
    _, out2 = step(params, pipe.init_state(), rgb, depth, calib)
    np.testing.assert_array_equal(np.asarray(out1.workspace.valid),
                                  np.asarray(out2.workspace.valid))
    np.testing.assert_array_equal(np.asarray(out1.objects_flat.points),
                                  np.asarray(out2.objects_flat.points))


def test_step_scan_matches_sequential_steps(pipe_and_params):
    """Throughput mode (`Pipeline.step_scan`) must be bit-identical to the
    frame-at-a-time loop, including skip semantics for bad-status frames."""
    pipe, params = pipe_and_params
    src = SyntheticSource(num_cameras=2, num_frames=3, hw=(H, W))
    calib = CameraCalib.from_config(pipe.cfg)
    pkts = [src.get(i) for i in range(3)]
    rgb = jnp.stack([jnp.asarray(p.rgb) for p in pkts])
    depth = jnp.stack([jnp.asarray(p.depth) for p in pkts])
    good = jnp.asarray([True, False, True])  # frame 1 is a bad-status skip

    scan = jax.jit(pipe.step_scan)
    st_scan, outs = scan(params, pipe.init_state(), rgb, depth, calib, good)

    step = jax.jit(pipe.step)
    st = pipe.init_state()
    seq = []
    for i, p in enumerate(pkts):
        new_st, out = step(params, st, jnp.asarray(p.rgb),
                           jnp.asarray(p.depth), calib)
        seq.append(out)
        if bool(good[i]):  # the reference `continue`s on bad frames
            st = new_st

    for i in (0, 2):  # good frames: identical outputs
        np.testing.assert_array_equal(
            np.asarray(outs.workspace.valid[i]),
            np.asarray(seq[i].workspace.valid))
        np.testing.assert_array_equal(
            np.asarray(outs.objects_flat.points[i]),
            np.asarray(seq[i].objects_flat.points))
        np.testing.assert_array_equal(
            np.asarray(outs.track_ids[i]), np.asarray(seq[i].track_ids))
    # tracker state advanced exactly twice (bad frame did not update it)
    assert int(st_scan.tracker.frame_id[0]) == int(st.tracker.frame_id[0]) == 2


def test_driver_coalesced_drain_order(pipe_and_params):
    """Per-frame fused mode with pipeline_depth=3: the coalesced sync
    (one block_until_ready clears the whole pending queue — VERDICT r4
    #5 latency-mode fix) must still deliver every frame's outputs to
    on_frame exactly once, in order, with per-frame state advance."""
    from rt3d.runtime.driver import PipelineDriver

    pipe, params = pipe_and_params
    src = SyntheticSource(num_cameras=2, num_frames=7, hw=(H, W))
    seen = []
    driver = PipelineDriver(pipe, params, mode="fused", pipeline_depth=3)
    res = driver.run(src, num_frames=7, warmup=0,
                     on_frame=lambda i, o: seen.append(i))
    assert seen == list(range(7))
    assert res.mean_fps > 0 and res.skipped_frames == 0
    assert int(driver.state.tracker.frame_id[0]) == 7


def test_driver_scan_mode_runs(pipe_and_params):
    """PipelineDriver(frames_per_dispatch=2) over 5 frames (odd tail)."""
    from rt3d.runtime.driver import PipelineDriver

    pipe, params = pipe_and_params
    src = SyntheticSource(num_cameras=2, num_frames=5, hw=(H, W))
    seen = []
    driver = PipelineDriver(pipe, params, mode="fused", pipeline_depth=2,
                            frames_per_dispatch=2)
    res = driver.run(src, num_frames=5, warmup=0,
                     on_frame=lambda i, o: seen.append(i))
    assert seen == [0, 1, 2, 3, 4]
    assert res.mean_fps > 0
    assert res.skipped_frames == 0
    assert int(driver.state.tracker.frame_id[0]) == 5


def test_driver_scan_mode_chunk_source(pipe_and_params):
    """A source exposing `get_chunk` (pre-stacked replay chunks, the
    driver's chunked fast path) must match the per-frame fetch path
    bit-for-bit, including tail padding beyond num_frames."""
    import jax
    from rt3d.runtime.driver import PipelineDriver

    pipe, params = pipe_and_params
    src = SyntheticSource(num_cameras=2, num_frames=6, hw=(H, W))

    class ChunkSource:
        def get_chunk(self, start, k):
            pkts = [src.get((start + j) % 6) for j in range(k)]
            return (np.stack([p.rgb for p in pkts]),
                    np.stack([p.depth for p in pkts]),
                    [True] * k)

    outs = {}
    for name, source in (("frame", src), ("chunk", ChunkSource())):
        driver = PipelineDriver(pipe, params, mode="fused", pipeline_depth=2,
                                frames_per_dispatch=2)
        seen = []
        res = driver.run(source, num_frames=5, warmup=0,
                         on_frame=lambda i, o: seen.append(i))
        assert seen == [0, 1, 2, 3, 4]
        # frame 5 exists only as chunk padding: masked, never delivered
        assert int(driver.state.tracker.frame_id[0]) == 5
        outs[name] = res.last_outputs
    np.testing.assert_array_equal(
        np.asarray(outs["frame"].workspace.valid),
        np.asarray(outs["chunk"].workspace.valid))
    np.testing.assert_array_equal(
        np.asarray(outs["frame"].track_ids), np.asarray(outs["chunk"].track_ids))


def test_driver_scan_mode_skips_bad_frames(pipe_and_params, tmp_path):
    """Scan mode must honor the frame loop's bad-frame contract: on_frame
    never sees error-status frames or tail padding, last_outputs is the
    last GOOD frame, and timings.csv stays per-frame column-aligned."""
    from rt3d.io.source import FramePacket
    from rt3d.runtime.driver import PipelineDriver
    from rt3d.viz.plots import read_timings

    pipe, params = pipe_and_params

    class FlakySource:
        def get(self, i):
            status = np.zeros(2, np.uint32)
            if i in (1, 4):
                status[1] = 7
            rgb = np.zeros((2, H, W, 3), np.uint8)
            rgb[:, :, :, 0] = i  # vary inputs per frame
            return FramePacket(
                rgb=rgb, depth=np.ones((2, H, W), np.float32),
                status=status, index=i,
            )

    seen = []
    tim = str(tmp_path / "timings.csv")
    driver = PipelineDriver(pipe, params, mode="fused", pipeline_depth=2,
                            frames_per_dispatch=2, timings_path=tim)
    res = driver.run(FlakySource(), num_frames=5, warmup=0,
                     on_frame=lambda i, o: seen.append(i))
    assert seen == [0, 2, 3]  # 1 and 4 bad; 5..: beyond num_frames
    assert res.skipped_frames == 2
    assert res.last_outputs is not None
    # per-frame CSV alignment: every stage row has one value per GOOD frame
    cols = read_timings(tim)
    n_good = len(seen)
    assert len(cols["Total Time per Iteration"]) == n_good
    assert len(cols["Frame Retrieval"]) == n_good
    # tracker advanced only on good frames
    assert int(driver.state.tracker.frame_id[0]) == 3


def test_driver_profile_mode_fills_stage_rows(pipe_and_params, tmp_path):
    """mode='profile' (stage-split jits, the reference's per-stage timing
    analog) still drives every stage after refactors and fills the CSV
    schema columns the fused mode can't."""
    from rt3d.runtime.driver import PipelineDriver

    pipe, params = pipe_and_params
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(H, W))
    driver = PipelineDriver(
        pipe, params, mode="profile",
        timings_path=str(tmp_path / "timings.csv"),
    )
    res = driver.run(src, num_frames=2, warmup=0)
    assert res.frames == 2
    for stage in ("Point Cloud Processing", "YOLO11 Inference",
                  "Mask Processing", "Point Cloud Fusion", "Subtraction"):
        assert res.summary_ms.get(stage, 0.0) > 0.0, stage


def test_workspace_accumulation_survives_transient_occlusion():
    """Stretch config (BASELINE configs[4], persistent TSDF-style workspace
    accumulation): a depth dropout that wipes half the table from the
    instantaneous workspace cloud must NOT wipe it from the accumulated
    one — and the memory must fade once the dropout persists (decay)."""
    import dataclasses

    base = tiny_config()
    cfg = dataclasses.replace(
        base, pipeline=dataclasses.replace(
            base.pipeline, workspace_accumulate=True, accum_capacity=16384,
            accum_decay=0.9, accum_obs_weight=1.0, accum_min_weight=0.5,
        ))
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    pipe_plain = build_pipeline(base)

    src = SyntheticSource(num_cameras=2, num_frames=4, hw=(H, W))
    calib = CameraCalib.from_config(cfg)
    pkt = src.get(0)
    rgb, depth = jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth)

    step = jax.jit(pipe.step)
    state = pipe.init_state()
    for _ in range(3):  # build up weight on the steady scene
        state, out = step(params, state, rgb, depth, calib)
    n_full = int(out.workspace.count)
    assert n_full > 200

    # dropout: left half of every depth map goes invalid
    occ = np.asarray(pkt.depth).copy()
    occ[:, :, : W // 2] = np.nan
    occ = jnp.asarray(occ)

    # the per-frame-rebuild pipeline loses the occluded half immediately
    _, out_plain = jax.jit(pipe_plain.step)(
        params, pipe_plain.init_state(), rgb, occ, calib)
    n_plain = int(out_plain.workspace.count)
    assert n_plain < 0.7 * n_full, (n_plain, n_full)

    # the accumulated workspace barely notices one bad frame
    state, out_occ = step(params, state, rgb, occ, calib)
    n_acc = int(out_occ.workspace.count)
    assert n_acc > 0.9 * n_full, (n_acc, n_full)
    # and the surviving cloud still covers the occluded region: compare
    # x-extent of accumulated vs instantaneous clouds
    pts_acc = np.asarray(out_occ.workspace.points)[
        np.asarray(out_occ.workspace.valid)]
    pts_pl = np.asarray(out_plain.workspace.points)[
        np.asarray(out_plain.workspace.valid)]
    assert pts_acc[:, 0].min() < pts_pl[:, 0].min() - 0.05 or \
        pts_acc[:, 0].max() > pts_pl[:, 0].max() + 0.05

    # persistent dropout: weights decay below the threshold and the
    # occluded half fades from the published cloud (no immortal ghosts)
    for _ in range(25):
        state, out_occ = step(params, state, rgb, occ, calib)
    n_late = int(out_occ.workspace.count)
    assert n_late < n_acc - 0.5 * (n_full - n_plain), (n_late, n_acc)
    assert int(out_occ.overflow) == 0


def test_accum_skip_prededupe_same_voxel_set():
    """`accum_skip_prededupe` (the 1 mm stretch optimization: raw rays feed
    the accumulator, whose merge is the global dedupe) must publish exactly
    the same extracted voxel SET as the per-camera-dedupe path — only the
    weights may differ (per-ray vs per-voxel support). Runs with the
    default conf so live detections exercise subtraction: the raw path
    snaps rays to voxel centers before it, so near-threshold keep/drop
    decisions are identical in both modes."""
    import dataclasses

    base = tiny_config()
    sets = []
    for skip in (False, True):
        cfg = dataclasses.replace(
            base, pipeline=dataclasses.replace(
                base.pipeline, workspace_accumulate=True,
                accum_capacity=16384, accum_decay=0.9, accum_obs_weight=1.0,
                accum_min_weight=0.5, accum_skip_prededupe=skip,
            ))
        pipe = build_pipeline(cfg)
        params = pipe.model.init(jax.random.PRNGKey(0))
        calib = CameraCalib.from_config(cfg)
        src = SyntheticSource(num_cameras=2, num_frames=2, hw=(H, W))
        state = pipe.init_state()
        step = jax.jit(pipe.step)
        for i in range(2):
            pkt = src.get(i)
            state, out = step(params, state, jnp.asarray(pkt.rgb),
                              jnp.asarray(pkt.depth), calib)
        assert int(out.overflow) == 0
        pts = np.asarray(out.workspace.points)[np.asarray(out.workspace.valid)]
        assert len(pts) > 200
        sets.append({tuple(q) for q in
                     np.round(pts / cfg.pipeline.voxel_size).astype(int)})
    assert sets[0] == sets[1]


def test_workspace_accumulation_scan_and_checkpoint(tmp_path):
    """Accumulator state rides the scan path's good-frame masking and the
    checkpoint round-trip like every other piece of PipelineState."""
    import dataclasses

    from rt3d.runtime.checkpoint import load_pytree, save_pytree

    base = tiny_config()
    cfg = dataclasses.replace(
        base, pipeline=dataclasses.replace(
            base.pipeline, workspace_accumulate=True, accum_capacity=16384,
        ))
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    src = SyntheticSource(num_cameras=2, num_frames=3, hw=(H, W))
    calib = CameraCalib.from_config(cfg)
    pkts = [src.get(i) for i in range(3)]
    rgb = jnp.stack([jnp.asarray(p.rgb) for p in pkts])
    depth = jnp.stack([jnp.asarray(p.depth) for p in pkts])
    good = jnp.asarray([True, False, True])

    st_scan, _ = jax.jit(pipe.step_scan)(
        params, pipe.init_state(), rgb, depth, calib, good)

    step = jax.jit(pipe.step)
    st = pipe.init_state()
    for i in range(3):
        new_st, _ = step(params, st, rgb[i], depth[i], calib)
        if bool(good[i]):
            st = new_st
    np.testing.assert_array_equal(np.asarray(st_scan.accum.keys_hi),
                                  np.asarray(st.accum.keys_hi))
    np.testing.assert_array_equal(np.asarray(st_scan.accum.keys_lo),
                                  np.asarray(st.accum.keys_lo))
    np.testing.assert_allclose(np.asarray(st_scan.accum.weight),
                               np.asarray(st.accum.weight), rtol=1e-6)

    ckpt = str(tmp_path / "state.npz")
    save_pytree(ckpt, st)
    restored = load_pytree(ckpt, jax.eval_shape(pipe.init_state))
    np.testing.assert_array_equal(np.asarray(restored.accum.keys_hi),
                                  np.asarray(st.accum.keys_hi))
    np.testing.assert_array_equal(np.asarray(restored.accum.keys_lo),
                                  np.asarray(st.accum.keys_lo))
