"""Tests for extension components: image ops, voxel sets, accumulator,
BoT-SORT appearance/GMC, driver failure semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.geometry.image import dilate_mask, erode_mask, random_subsample
from rt3d.geometry.ops import PointBuffer
from rt3d.geometry.voxel_sets import (
    VoxelAccumulator,
    accumulate_voxels,
    extract_accumulated,
    subtract_voxel_sets,
)


def _buf(points, cap=None):
    pts = np.asarray(points, np.float32)
    cap = cap or len(pts)
    pad = np.zeros((cap - len(pts), 3), np.float32)
    valid = np.zeros(cap, bool)
    valid[: len(pts)] = True
    return PointBuffer(points=jnp.asarray(np.vstack([pts, pad])),
                       valid=jnp.asarray(valid))


# --------------------------------------------------------------------------
# image ops
# --------------------------------------------------------------------------


def test_erode_mask_matches_cv2_semantics(rng):
    m = np.zeros((32, 32), bool)
    m[8:24, 8:24] = True
    got = np.asarray(erode_mask(jnp.asarray(m), kernel_size=5))
    # 16x16 square eroded by 5x5 -> 12x12 centred square
    expect = np.zeros((32, 32), bool)
    expect[10:22, 10:22] = True
    np.testing.assert_array_equal(got, expect)
    try:
        import cv2

        cv = cv2.erode(m.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0
        np.testing.assert_array_equal(got, cv)
    except ImportError:
        pass


def test_dilate_mask(rng):
    m = np.zeros((16, 16), bool)
    m[8, 8] = True
    got = np.asarray(dilate_mask(jnp.asarray(m), kernel_size=3))
    assert got[7:10, 7:10].all()
    assert got.sum() == 9


def test_random_subsample_fraction(rng):
    buf = _buf(rng.normal(size=(2000, 3)))
    out = random_subsample(buf, 0.05, jax.random.PRNGKey(0))
    n = int(out.count)
    assert 50 <= n <= 160  # ~5% of 2000


# --------------------------------------------------------------------------
# voxel sets
# --------------------------------------------------------------------------


def test_subtract_voxel_sets_oracle(rng):
    voxel = 0.01
    ws = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
    obj = ws[:80] + rng.uniform(-voxel / 4, voxel / 4, (80, 3)).astype(np.float32)
    out = subtract_voxel_sets(_buf(ws, 512), _buf(obj, 128), voxel)
    keep = np.asarray(out.valid)[:400]
    # oracle: voxel tuples set difference (reference voxel_grid_subtract)
    qw = np.round(ws / voxel).astype(int)
    qo = {tuple(q) for q in np.round(obj / voxel).astype(int)}
    expect = np.array([tuple(q) not in qo for q in qw])
    np.testing.assert_array_equal(keep, expect)


def test_accumulator_persistence_and_decay(rng):
    voxel = 0.01
    acc = VoxelAccumulator.empty(1024)
    stable = rng.uniform(-0.3, 0.3, (100, 3)).astype(np.float32)
    step = jax.jit(lambda a, b: accumulate_voxels(
        a, b.points, b.valid, voxel, decay=0.5, obs_weight=1.0))
    # observe the same cloud 4x: weights approach 2.0 (geometric series)
    for _ in range(4):
        acc, ovf = step(acc, _buf(stable, 128))
    assert int(ovf) == 0
    out = extract_accumulated(acc, voxel, min_weight=1.5)
    n_stable = len(np.unique(np.round(stable / voxel).astype(int), axis=0))
    assert int(out.count) == n_stable
    # one transient observation then absence: weight decays below threshold
    ghost = np.array([[1.0, 1.0, 0.2]], np.float32)
    acc, _ = step(acc, _buf(ghost, 128))
    for _ in range(3):
        acc, _ = step(acc, _buf(stable, 128))
    out = extract_accumulated(acc, voxel, min_weight=0.5)
    pts = np.asarray(out.points)[np.asarray(out.valid)]
    d = np.linalg.norm(pts - ghost[0], axis=1)
    assert d.min() > 0.05  # ghost voxel evaporated


def test_accumulator_eviction_overflow(rng):
    voxel = 0.01
    acc = VoxelAccumulator.empty(64)
    cloud = rng.uniform(-0.5, 0.5, (500, 3)).astype(np.float32)
    acc, ovf = accumulate_voxels(acc, jnp.asarray(cloud),
                                 jnp.ones(500, bool), voxel)
    assert int(ovf) > 0
    assert int(extract_accumulated(acc, voxel, min_weight=0.5).count) == 64


# --------------------------------------------------------------------------
# BoT-SORT pieces
# --------------------------------------------------------------------------


def test_botsort_cost_fusion():
    from rt3d.tracking.botsort import botsort_fuse_costs, embedding_distance

    e1 = jnp.asarray([[1.0, 0.0], [0.0, 1.0]])
    e2 = jnp.asarray([[1.0, 0.0], [0.7071, 0.7071]])
    d = np.asarray(embedding_distance(e1, e2))
    np.testing.assert_allclose(d[0, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(d[1, 1], 1 - 0.7071, atol=1e-3)

    iou_cost = jnp.asarray([[0.2, 0.9], [0.9, 0.3]])
    emb_cost = jnp.asarray([[0.1, 0.1], [0.1, 0.8]])
    fused = np.asarray(botsort_fuse_costs(iou_cost, emb_cost, 0.5, 0.25))
    assert fused[0, 0] == 0.05          # emb/2 wins
    assert fused[0, 1] == 0.9           # proximity gate kills appearance
    assert fused[1, 1] == 0.3           # emb over appearance_thresh -> 1


def test_gmc_translation_estimate(rng):
    from rt3d.tracking.botsort import estimate_translation_gmc

    base = rng.uniform(0, 1, (96, 160)).astype(np.float32)
    # smooth it so phase correlation has structure
    from scipy.ndimage import gaussian_filter

    base = gaussian_filter(base, 3)
    shifted = np.roll(np.roll(base, 5, axis=1), -3, axis=0)
    shift = np.asarray(estimate_translation_gmc(jnp.asarray(base),
                                                jnp.asarray(shifted)))
    np.testing.assert_allclose(shift, [5.0, -3.0], atol=1.0)


def test_botsort_pipeline_smoke():
    """Full pipeline step with tracker_type=botsort + reid + gmc."""
    import dataclasses

    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import CameraCalib, build_pipeline
    from tests.tiny import H, W, tiny_config

    cfg = tiny_config()
    cfg = dataclasses.replace(
        cfg,
        tracker=dataclasses.replace(
            cfg.tracker, tracker_type="botsort", with_reid=True, gmc=True
        ),
    )
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(H, W))
    step = jax.jit(pipe.step)
    state = pipe.init_state()
    for i in range(2):
        pkt = src.get(i)
        state, out = step(params, state, jnp.asarray(pkt.rgb),
                          jnp.asarray(pkt.depth), calib)
    assert int(state.tracker.frame_id[0]) == 2
    assert state.prev_gray.shape[1] > 1  # GMC gray buffer active


# --------------------------------------------------------------------------
# driver failure semantics
# --------------------------------------------------------------------------


def test_driver_skips_bad_status_frames():
    from rt3d.io.source import FramePacket
    from rt3d.pipeline.step import build_pipeline
    from rt3d.runtime.driver import PipelineDriver
    from tests.tiny import H, W, tiny_config

    cfg = tiny_config()
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))

    class FlakySource:
        def get(self, i):
            status = np.zeros(2, np.uint32)
            if i % 3 == 1:
                status[1] = 7  # depth error on cam2 (ZED-style error code)
            return FramePacket(
                rgb=np.zeros((2, H, W, 3), np.uint8),
                depth=np.ones((2, H, W), np.float32),
                status=status, index=i,
            )

    driver = PipelineDriver(pipe, params, mode="fused")
    res = driver.run(FlakySource(), num_frames=6)
    assert res.skipped_frames == 2
    # tracker only advanced on good frames
    assert int(driver.state.tracker.frame_id[0]) == 4


def test_gmc_affine_recovers_similarity(rng):
    """Affine GMC on synthetic camera shake: a known rotation+scale+shift
    must come back from the grid-correlation + robust-LSQ fit
    (the sparseOptFlow+RANSAC parity target, `trackers/botsort.yaml:14`)."""
    from jax.scipy.ndimage import map_coordinates

    from rt3d.tracking.botsort import estimate_affine_gmc

    from scipy.ndimage import gaussian_filter

    h, w = 96, 160
    base = gaussian_filter(rng.uniform(0, 1, (h, w)).astype(np.float32), 2)

    # warp maps PREV coords -> CUR coords: small rotation + zoom + shift
    th, s = 0.02, 1.01
    A = s * np.array([[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]],
                     np.float32)
    b = np.array([3.0, -2.0], np.float32)
    # render cur: cur(x) = prev(A^-1 (x - b)), coords are (x, y)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    pts = np.stack([xs.ravel(), ys.ravel()], axis=0)  # (2, N) as (x, y)
    src = np.linalg.inv(A) @ (pts - b[:, None])
    cur = np.asarray(map_coordinates(
        jnp.asarray(base), [jnp.asarray(src[1].reshape(h, w)),
                            jnp.asarray(src[0].reshape(h, w))], order=1,
    ))

    warp = np.asarray(estimate_affine_gmc(jnp.asarray(base), jnp.asarray(cur)))
    # patch shifts are integer-quantized, so allow ~1px-scale tolerances
    np.testing.assert_allclose(warp[:, :2], A, atol=0.03)
    np.testing.assert_allclose(warp[:, 2], b, atol=2.0)


def test_gmc_affine_flat_frame_decays_to_identity():
    from rt3d.tracking.botsort import estimate_affine_gmc

    flat = jnp.zeros((96, 160), jnp.float32)
    warp = np.asarray(estimate_affine_gmc(flat, flat))
    np.testing.assert_allclose(warp[:, :2], np.eye(2), atol=1e-3)
    np.testing.assert_allclose(warp[:, 2], 0.0, atol=1e-3)


def test_gmc_rescale_warp_and_apply(rng):
    """rescale_warp must commute with the coordinate change, and
    apply_gmc_to_tracks must move centres/heights/velocities correctly."""
    from rt3d.tracking.botsort import apply_gmc_to_tracks, rescale_warp

    A = np.array([[1.02, -0.03], [0.03, 1.02]], np.float32)
    b = np.array([1.5, -0.7], np.float32)
    warp_small = jnp.asarray(np.concatenate([A, b[:, None]], axis=1))
    scale, off = 0.25, np.array([4.0, 8.0], np.float32)

    warp_big = np.asarray(rescale_warp(warp_small, scale, off))
    # check on a random original-coordinate point: small = scale*big + off
    p_big = rng.uniform(0, 100, (2,)).astype(np.float32)
    p_small = scale * p_big + off
    q_small = A @ p_small + b
    q_big_expected = (q_small - off) / scale
    q_big = warp_big[:, :2] @ p_big + warp_big[:, 2]
    np.testing.assert_allclose(q_big, q_big_expected, rtol=1e-5, atol=1e-3)

    mean = np.zeros((3, 8), np.float32)
    mean[:, 0:2] = [[10, 20], [30, 40], [0, 0]]
    mean[:, 3] = 50.0
    mean[:, 4:6] = [[1, 0], [0, 1], [2, 2]]
    mean[:, 7] = 5.0
    out = np.asarray(apply_gmc_to_tracks(jnp.asarray(mean),
                                         jnp.asarray(warp_big)))
    np.testing.assert_allclose(
        out[0, 0:2], warp_big[:, :2] @ mean[0, 0:2] + warp_big[:, 2],
        rtol=1e-5)
    det_scale = np.sqrt(abs(np.linalg.det(warp_big[:, :2])))
    np.testing.assert_allclose(out[:, 3], 50.0 * det_scale, rtol=1e-5)
    np.testing.assert_allclose(out[0, 4:6], warp_big[:, :2] @ mean[0, 4:6],
                               rtol=1e-5)


def test_erode_mask_border_matches_cv2_default(rng):
    """cv2.erode's DEFAULT borderValue is +DBL_MAX (the min identity):
    borders do not erode. Pin our reduce_window padding to that."""
    m = np.ones((10, 10), bool)
    got = np.asarray(erode_mask(jnp.asarray(m), kernel_size=5))
    assert got.all()  # all-ones mask survives intact, border included
    try:
        import cv2

        cv = cv2.erode(m.astype(np.uint8), np.ones((5, 5), np.uint8)) > 0
        np.testing.assert_array_equal(got, cv)
    except ImportError:
        pass
