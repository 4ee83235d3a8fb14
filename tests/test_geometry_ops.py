"""Op-level tests of rt3d.geometry against the NumPy oracles."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from rt3d.geometry import (
    PointBuffer,
    aabb_mask,
    backproject_depth_grid,
    compact_points,
    masked_centroid,
    rigid_transform,
    sor_inlier_mask,
    subtract_min_dist,
    voxel_downsample,
    voxel_downsample_masks,
)
from tests import oracles


def _buf_to_np(buf: PointBuffer) -> np.ndarray:
    pts = np.asarray(buf.points)
    val = np.asarray(buf.valid)
    return pts[val]


def test_backproject_matches_gather_oracle(rng):
    h, w = 48, 64
    depth = rng.uniform(0.2, 3.0, (h, w)).astype(np.float32)
    depth[5, 7] = 0.0
    depth[10, 11] = np.nan
    depth[20, 21] = np.inf
    fx, fy, cx, cy = 500.0, 510.0, 32.0, 24.0

    xyz, valid = backproject_depth_grid(jnp.asarray(depth), fx, fy, cx, cy)
    xyz, valid = np.asarray(xyz), np.asarray(valid)

    mask_idx = np.argwhere(np.ones((h, w), bool))
    expect = oracles.backproject_oracle(mask_idx, depth, cx, cy, fx, fy)
    got = xyz.reshape(-1, 3)[valid.reshape(-1)]
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)
    assert not valid[5, 7] and not valid[10, 11] and not valid[20, 21]


def test_rigid_transform(rng):
    pts = rng.normal(size=(100, 3)).astype(np.float32)
    theta = 0.7
    R = np.array(
        [[np.cos(theta), -np.sin(theta), 0], [np.sin(theta), np.cos(theta), 0], [0, 0, 1]],
        dtype=np.float32,
    )
    t = np.array([0.1, -0.2, 0.3], np.float32)
    got = np.asarray(rigid_transform(jnp.asarray(pts), jnp.asarray(R), jnp.asarray(t)))
    expect = (R @ pts.T).T + t
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_aabb_mask(rng):
    pts = rng.uniform(-1, 2, (500, 3)).astype(np.float32)
    xb, yb, zb = (-0.25, 0.75), (-0.5, 1.75), (-0.05, 2.0)
    m = np.asarray(aabb_mask(jnp.asarray(pts), xb, yb, zb))
    expect = oracles.crop_oracle(pts, xb, yb, zb)
    np.testing.assert_allclose(np.sort(pts[m], axis=0), np.sort(expect, axis=0))


def test_compact_points_contiguous(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    emit = rng.uniform(size=64) < 0.4
    buf, overflow = compact_points(jnp.asarray(pts), jnp.asarray(emit), 32)
    got = _buf_to_np(buf)
    np.testing.assert_allclose(got, pts[emit])
    assert int(overflow) == 0
    v = np.asarray(buf.valid)
    assert v[: got.shape[0]].all() and not v[got.shape[0]:].any()


def test_compact_points_overflow(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    emit = np.ones(64, bool)
    buf, overflow = compact_points(jnp.asarray(pts), jnp.asarray(emit), 16)
    np.testing.assert_allclose(_buf_to_np(buf), pts[:16])
    assert int(overflow) == 48


@pytest.mark.parametrize("voxel", [0.005, 0.01, 0.05])
def test_voxel_downsample_matches_unique_oracle(rng, voxel):
    pts = rng.uniform(-0.5, 0.5, (300, 3)).astype(np.float32)
    pts = np.vstack([pts, pts[:50]])  # guarantee duplicates
    valid = np.ones(len(pts), bool)
    valid[-10:] = False
    buf, overflow = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), voxel, 512)
    got = _buf_to_np(buf)
    expect = oracles.voxel_downsample_oracle(pts[valid], voxel)
    assert int(overflow) == 0
    np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-7)  # incl. lex order


def test_voxel_downsample_masks_shared_sort(rng):
    n, d = 400, 4
    pts = rng.uniform(-0.3, 0.3, (n, 3)).astype(np.float32)
    pts[50:100] = pts[:50]  # duplicates across the cloud
    valid = rng.uniform(size=n) < 0.9
    masks = rng.uniform(size=(d, n)) < 0.5
    voxel = 0.02
    buf, overflow = voxel_downsample_masks(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(masks), voxel, 256
    )
    for i in range(d):
        got = np.asarray(buf.points[i])[np.asarray(buf.valid[i])]
        expect = oracles.voxel_downsample_oracle(pts[masks[i] & valid], voxel)
        np.testing.assert_allclose(got, expect, rtol=1e-6, atol=1e-7)


def test_voxel_downsample_grid_matches_flat(rng):
    """The grid fast path must produce exactly the flat path's unique set,
    including when duplicates land FAR apart in the image (outside any
    window): exactness may not depend on the locality heuristic."""
    from rt3d.geometry.ops import voxel_downsample_grid

    h, w = 24, 40
    voxel = 0.05
    # adversarial: a tiny value pool guarantees many duplicates at arbitrary
    # image distances, plus smooth regions for in-window duplicates
    pts = rng.choice(np.arange(-6, 7) * voxel, size=(h, w, 3)).astype(np.float32)
    pts[8:16, 8:16] = rng.normal(0, 0.01, (8, 8, 3)).astype(np.float32)
    valid = rng.uniform(size=(h, w)) < 0.8

    # capacity >= grid size: exactness must hold for ANY duplicate layout
    # (under capacity PRESSURE the grid path may drop more than the flat
    # path — straggler duplicates waste pre-truncation slots — but always
    # counts the difference in overflow; that case is exercised in
    # test_voxel_downsample_grid_overflow_counts)
    cap = h * w + 64  # also exercises the pad-to-capacity branch
    got, ovf = voxel_downsample_grid(
        jnp.asarray(pts), jnp.asarray(valid), voxel, cap
    )
    want, ovf2 = voxel_downsample(
        jnp.asarray(pts.reshape(-1, 3)), jnp.asarray(valid.reshape(-1)),
        voxel, cap,
    )
    g = np.asarray(got.points)[np.asarray(got.valid)]
    e = np.asarray(want.points)[np.asarray(want.valid)]
    np.testing.assert_allclose(g, e, atol=1e-7)
    assert int(ovf) == int(ovf2) == 0


def test_voxel_downsample_flat_capacity_pressure(rng):
    """Packed single-word path with capacity < unique count: the masked
    re-sort compaction keeps the lex-smallest `capacity` voxels and counts
    the rest (forces the compaction branch, not the capacity>=n fast path)."""
    pts = rng.uniform(-0.5, 0.5, (400, 3)).astype(np.float32)
    pts = np.vstack([pts, pts[:80]])
    valid = np.ones(len(pts), bool)
    valid[-20:] = False
    expect_all = oracles.voxel_downsample_oracle(pts[valid], 0.01)
    cap = len(expect_all) // 2
    buf, ovf = voxel_downsample(jnp.asarray(pts), jnp.asarray(valid), 0.01, cap)
    got = _buf_to_np(buf)
    assert int(ovf) == len(expect_all) - cap
    np.testing.assert_allclose(got, expect_all[:cap], rtol=1e-6, atol=1e-7)


def test_voxel_downsample_grid_overflow_counts(rng):
    from rt3d.geometry.ops import voxel_downsample_grid

    h, w = 16, 16
    voxel = 0.01
    # every point unique -> 256 voxels, capacity 64
    xs, ys = np.meshgrid(np.arange(w), np.arange(h))
    pts = np.stack([xs * 0.02, ys * 0.02, np.zeros_like(xs)], -1).astype(np.float32)
    got, ovf = voxel_downsample_grid(
        jnp.asarray(pts), jnp.ones((h, w), bool), voxel, 64
    )
    assert int(np.asarray(got.valid).sum()) == 64
    assert int(ovf) == 256 - 64


def test_voxel_masks_grid_matches_flat(rng):
    """Grid-accelerated masked dedupe == flat masked dedupe, with scattered
    far-apart duplicates (window misses must be OR-merged post-sort)."""
    h, w, d = 16, 32, 5
    voxel = 0.05
    pts = rng.choice(np.arange(-5, 6) * voxel, size=(h * w, 3)).astype(np.float32)
    valid = rng.uniform(size=h * w) < 0.9
    masks = rng.uniform(size=(d, h * w)) < 0.3

    cap = 128
    a, ovf_a = voxel_downsample_masks(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(masks), voxel, cap,
        stage1_capacity=h * w, union_capacity=h * w, grid_hw=(h, w),
    )
    b, ovf_b = voxel_downsample_masks(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(masks), voxel, cap,
        stage1_capacity=h * w, union_capacity=h * w,
    )
    for i in range(d):
        ga = np.asarray(a.points[i])[np.asarray(a.valid[i])]
        gb = np.asarray(b.points[i])[np.asarray(b.valid[i])]
        np.testing.assert_allclose(ga, gb, atol=1e-7, err_msg=f"det {i}")
        expect = oracles.voxel_downsample_oracle(
            pts.reshape(-1, 3)[masks[i] & valid], voxel
        )[:cap]  # lex order; capacity drops the lex-last voxels
        np.testing.assert_allclose(ga, expect, atol=1e-7)


def test_masked_centroid(rng):
    pts = rng.normal(size=(32, 3)).astype(np.float32)
    valid = rng.uniform(size=32) < 0.7
    got = np.asarray(masked_centroid(jnp.asarray(pts), jnp.asarray(valid)))
    np.testing.assert_allclose(got, pts[valid].mean(axis=0), rtol=1e-5, atol=1e-6)


def test_sor_matches_oracle(rng):
    # dense cluster + a few blatant outliers
    cluster = rng.normal(0, 0.02, (120, 3)).astype(np.float32)
    outliers = rng.normal(0, 1.5, (6, 3)).astype(np.float32) + 3.0
    pts = np.vstack([cluster, outliers])
    perm = rng.permutation(len(pts))
    pts = pts[perm]
    pad = np.zeros((30, 3), np.float32)
    padded = np.vstack([pts, pad])
    valid = np.zeros(len(padded), bool)
    valid[: len(pts)] = True

    keep = np.asarray(
        sor_inlier_mask(jnp.asarray(padded), jnp.asarray(valid), 20, 1.5)
    )
    expect = oracles.sor_oracle(pts, 20, 1.5)
    np.testing.assert_array_equal(keep[: len(pts)], expect)
    assert not keep[len(pts):].any()
    # sanity: every far outlier rejected
    far = np.linalg.norm(pts, axis=1) > 2.0
    assert not keep[: len(pts)][far].any()


def test_sor_windowed_exact_on_small_cloud(rng):
    """With the window spanning the whole cloud, the Morton-window SOR is
    the exact algorithm (every point sees every candidate)."""
    from rt3d.geometry.sor import sor_inlier_mask_windowed

    cluster = rng.normal(0, 0.02, (100, 3)).astype(np.float32)
    outliers = rng.normal(0, 1.0, (5, 3)).astype(np.float32) + 2.0
    pts = np.vstack([cluster, outliers])[rng.permutation(105)]
    padded = np.vstack([pts, np.zeros((23, 3), np.float32)])
    valid = np.zeros(len(padded), bool)
    valid[:105] = True

    keep = np.asarray(sor_inlier_mask_windowed(
        jnp.asarray(padded), jnp.asarray(valid), 20, 1.5, window=128
    ))
    expect = oracles.sor_oracle(pts, 20, 1.5)
    np.testing.assert_array_equal(keep[:105], expect)
    assert not keep[105:].any()


def test_sor_windowed_agreement_at_scale(rng):
    """Workspace-scale agreement: a voxel-grid surface cloud (the real
    distribution after downsampling) + scattered far outliers. The window
    approximation may only err toward removing borderline inliers; it must
    agree with exact SOR on >=99% of points and reject every far outlier."""
    from rt3d.geometry.sor import sor_inlier_mask_windowed

    # two planar "table + wall" surfaces on a 5 mm grid, like a real
    # workspace cloud after voxel downsampling
    g = 0.005
    xs, ys = np.meshgrid(np.arange(48), np.arange(40))
    table = np.stack([xs.ravel() * g, ys.ravel() * g,
                      np.zeros(xs.size)], 1)
    wall = np.stack([xs.ravel() * g, np.zeros(xs.size),
                     ys.ravel() * g + 0.02], 1)
    surf = np.vstack([table, wall]).astype(np.float32)
    surf += rng.normal(0, 5e-4, surf.shape).astype(np.float32)
    outliers = rng.uniform(0.5, 1.5, (40, 3)).astype(np.float32)
    pts = np.vstack([surf, outliers])[rng.permutation(len(surf) + 40)]
    n = len(pts)
    padded = np.vstack([pts, np.zeros((4096 - n % 4096 if n % 4096 else 0, 3),
                                      np.float32)])
    valid = np.zeros(len(padded), bool)
    valid[:n] = True

    keep = np.asarray(sor_inlier_mask_windowed(
        jnp.asarray(padded), jnp.asarray(valid), 20, 1.5, window=64
    ))[:n]
    expect = oracles.sor_oracle(pts, 20, 1.5)
    far = np.linalg.norm(pts - pts.mean(0), axis=1) > 0.4
    assert not keep[far].any(), "far outliers must be rejected"
    agreement = (keep == expect).mean()
    assert agreement >= 0.99, f"windowed/exact agreement {agreement:.4f}"
    # one-sided error: never keep what exact SOR rejects
    assert not (keep & ~expect).any()


def test_sor_inlier_mask_dispatches_windowed_above_exact_scale(rng):
    """Above _EXACT_MAX_N rows sor_inlier_mask must route to the windowed
    approximation (the exact kernel OOMs VMEM / costs O(N^2 k) there —
    the 1 mm stretch config's 16 K-point fused slots hit this)."""
    from rt3d.geometry.sor import (_EXACT_MAX_N, sor_inlier_mask,
                                   sor_inlier_mask_windowed)

    n_cap = 2 * _EXACT_MAX_N
    pts = np.zeros((n_cap, 3), np.float32)
    n = 1500
    pts[:n] = rng.normal(0, 0.05, (n, 3)).astype(np.float32)
    pts[:10] += 2.0  # obvious outliers
    valid = np.zeros(n_cap, bool)
    valid[:n] = True
    got = np.asarray(sor_inlier_mask(jnp.asarray(pts), jnp.asarray(valid)))
    want = np.asarray(
        sor_inlier_mask_windowed(jnp.asarray(pts), jnp.asarray(valid)))
    np.testing.assert_array_equal(got, want)
    assert not got[:10].any() and got[10:n].mean() > 0.9


def test_subtract_matches_oracle(rng):
    ws = rng.uniform(-0.5, 0.5, (600, 3)).astype(np.float32)
    obj = ws[100:160] + rng.normal(0, 0.002, (60, 3)).astype(np.float32)
    thresh = 0.05

    ws_buf = PointBuffer.from_dense(jnp.asarray(ws))
    obj_pad = np.vstack([obj, np.zeros((68, 3), np.float32)])
    obj_valid = np.zeros(len(obj_pad), bool)
    obj_valid[: len(obj)] = True
    obj_buf = PointBuffer(points=jnp.asarray(obj_pad), valid=jnp.asarray(obj_valid))

    out = subtract_min_dist(ws_buf, obj_buf, thresh, tile=32)
    got = np.asarray(out.points)[np.asarray(out.valid)]
    expect = oracles.subtract_oracle(ws, obj, thresh)
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(expect, axis=0), atol=1e-6)


def test_subtract_empty_objects_keeps_everything(rng):
    ws = PointBuffer.from_dense(jnp.asarray(rng.normal(size=(100, 3)).astype(np.float32)))
    empty = PointBuffer.empty(64)
    out = subtract_min_dist(ws, empty, 0.05)
    assert bool(np.asarray(out.valid).all())


def test_voxel_ops_jit_and_no_recompile():
    f = jax.jit(lambda p, v: voxel_downsample(p, v, 0.01, 64))
    p = jnp.zeros((128, 3))
    v = jnp.ones((128,), bool)
    f(p, v)
    f(p + 1.0, v)  # same shapes -> cached


def test_window_dedupe_pallas_matches_xla(rng):
    """Interpret-mode proof that the Pallas window kernels match the XLA
    shifted-compare formulations they replace on TPU."""
    from rt3d.geometry.ops import (
        _INT_SENTINEL, _window_duplicate_mask, _window_prev_or,
    )
    from rt3d.geometry.pallas_ops import (
        window_dedupe_pallas, window_prev_or_pallas,
    )

    h, w = 24, 128
    # few distinct keys -> dense duplicate structure; sprinkle sentinels
    kg = rng.integers(0, 40, size=(h, w)).astype(np.int32)
    kg[rng.uniform(size=(h, w)) < 0.2] = _INT_SENTINEL
    kg = jnp.asarray(kg)
    wg = jnp.asarray(rng.integers(0, 2**20, size=(h, w)).astype(np.int32))
    wg = jnp.where(kg == _INT_SENTINEL, 0, wg)

    for dy, dx in ((4, 6), (2, 3), (0, 1)):
        got = window_dedupe_pallas(kg, int(_INT_SENTINEL), dy, dx,
                                   interpret=True)
        ref = jnp.where(_window_duplicate_mask(kg, dy, dx), _INT_SENTINEL, kg)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

        got_or = window_prev_or_pallas(kg, wg, dy, dx, interpret=True)
        ref_or = _window_prev_or(kg, wg, dy, dx)
        np.testing.assert_array_equal(np.asarray(got_or), np.asarray(ref_or))


def test_window_dedupe_pallas_layout_guard():
    from rt3d.geometry.pallas_ops import window_dedupe_pallas

    # width not a lane multiple -> kernel declines, caller falls back
    assert window_dedupe_pallas(jnp.zeros((16, 100), jnp.int32), 0) is None


def test_strided_grid_downsample_bit_exact(rng):
    from rt3d.geometry.ops import strided_grid_downsample

    x = jnp.asarray(rng.random((2, 48, 256)).astype(np.float32))
    for s in (1, 2, 4):
        got = np.asarray(jax.jit(strided_grid_downsample,
                                 static_argnums=1)(x, s))
        np.testing.assert_array_equal(got, np.asarray(x)[:, ::s, ::s])
    # non-divisible shapes fall back to the plain slice
    y = x[:, :45, :250]
    got = np.asarray(strided_grid_downsample(y, 2))
    np.testing.assert_array_equal(got, np.asarray(y)[:, ::2, ::2])


def test_strided_grid_downsample_nonfinite_depth(rng):
    """NaN/Inf invalid-depth pixels must not poison whole rows through the
    MXU dot (NaN*0=NaN): off-grid non-finites vanish, on-grid ones become
    0.0 — rejected by the same (z>0)&isfinite validity rule as NaN."""
    from rt3d.geometry.ops import strided_grid_downsample

    x = rng.random((1, 16, 256)).astype(np.float32)
    x[0, 0, 3] = np.nan      # off the stride-2 grid
    x[0, 2, 5] = np.inf      # off the grid
    x[0, 4, 6] = np.nan      # ON the grid
    got = np.asarray(jax.jit(strided_grid_downsample,
                             static_argnums=1)(jnp.asarray(x), 2))
    ref = x[:, ::2, ::2]
    finite = np.isfinite(ref)
    assert np.isfinite(got).all()
    np.testing.assert_array_equal(got[finite], ref[finite])
    assert got[0, 2, 3] == 0.0  # the on-grid NaN -> 0 (invalid either way)


def test_segmented_scans_match_oracle(rng):
    """The Hillis-Steele contiguous-shift segmented OR/SUM scans equal a
    straightforward per-segment prefix oracle, including non-power-of-two
    lengths and a segment spanning the array start."""
    from rt3d.geometry.ops import segmented_or_scan, segmented_sum_scan

    n = 1000  # non-power-of-two
    start = rng.random(n) < 0.1
    start[0] = True
    word = rng.integers(0, 2**20, n).astype(np.int32)
    val = rng.random(n).astype(np.float32)

    seg = np.cumsum(start) - 1
    or_expect = np.zeros(n, np.int32)
    sum_expect = np.zeros(n, np.float32)
    acc_or, acc_sum = 0, 0.0
    for i in range(n):
        if start[i]:
            acc_or, acc_sum = 0, 0.0
        acc_or |= int(word[i])
        acc_sum += float(val[i])
        or_expect[i] = acc_or
        sum_expect[i] = acc_sum
    del seg

    got_or = np.asarray(jax.jit(segmented_or_scan)(
        jnp.asarray(word), jnp.asarray(start)))
    got_sum = np.asarray(jax.jit(segmented_sum_scan)(
        jnp.asarray(val), jnp.asarray(start)))
    np.testing.assert_array_equal(got_or, or_expect)
    np.testing.assert_allclose(got_sum, sum_expect, rtol=2e-5, atol=1e-5)


def _overflow_attribution_case(voxel: float):
    """Stage-1 block-compaction pressure with per-detection attribution.

    512 unique-voxel pixels in 4 blocks of 128; det0 owns block 0, det1
    owns blocks 2-3; stage1_capacity=256 takes the first two LIVE blocks
    (0 and 2), dropping block 3 — 128 pixels that all belong to det1.
    Exact attribution (VERDICT r4 #10) must charge det1 alone; the former
    scalar broadcast charged both."""
    n, d = 512, 2
    idx = np.arange(n)
    pts = np.stack([
        (idx % 40 - 20) * voxel,
        (idx // 40 - 6) * voxel,
        np.zeros(n),
    ], -1).astype(np.float32)
    valid = np.ones(n, bool)
    masks = np.stack([idx < 128, idx >= 256])
    buf, overflow = voxel_downsample_masks(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(masks), voxel,
        capacity=256, stage1_capacity=256, union_capacity=512,
    )
    ovf = np.asarray(overflow)
    kept = np.asarray(buf.valid).sum(axis=1)
    assert list(kept) == [128, 128]
    assert list(ovf) == [0, 128], ovf
    # union-shrink pressure on top: the truncation drops lex-largest
    # emitted voxels; whichever detection owned them is the one charged.
    # Invariant: overflow[i] == live_pixels[i] - kept[i] for every i.
    buf2, ovf2 = voxel_downsample_masks(
        jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(masks), voxel,
        capacity=192, stage1_capacity=256, union_capacity=192,
    )
    kept2 = np.asarray(buf2.valid).sum(axis=1)
    live = np.array([128, 256])
    np.testing.assert_array_equal(np.asarray(ovf2), live - kept2)
    assert int(kept2.sum()) == 192


def test_voxel_masks_overflow_attribution_packed():
    _overflow_attribution_case(0.02)   # single-word packed path


def test_voxel_masks_overflow_attribution_packed2():
    _overflow_attribution_case(0.001)  # two-word 1 mm stretch path
