"""Hard-domain synthetic scene family: renderer correctness.

The hard family (`rt3d/io/synthetic.py` domain="hard") is the training /
eval domain that approximates the reference's real operating conditions
(occlusion, clutter, texture, lighting — `/root/reference/README.md:39-52`).
These tests pin the analytic contracts the detection/tracking goldens
lean on: z-buffer visibility, depth<->mask consistency, distractor class
bookkeeping, and determinism.
"""

import numpy as np
import pytest

from rt3d.io.synthetic import DISTRACTOR_CLASSES, SyntheticSource

HW = (180, 320)  # renderer is resolution-agnostic; keep tests fast


@pytest.fixture(scope="module")
def src():
    return SyntheticSource(num_cameras=2, num_frames=None, hw=HW,
                           num_objects=3, seed=5, domain="hard")


def test_shapes_and_classes(src):
    pkt = src.get(7)
    assert pkt.rgb.shape == (2, *HW, 3) and pkt.rgb.dtype == np.uint8
    assert pkt.depth.shape == (2, *HW) and pkt.depth.dtype == np.float32
    gt = src.gt_masks(7)
    gta = src.gt_masks_all(7)
    assert gt.shape == (2, 3, *HW)
    assert gta.shape[1] == 3 + len(src.distractor_classes)
    assert set(src.object_classes) <= {39, 41}
    assert set(src.distractor_classes) <= set(DISTRACTOR_CLASSES)
    assert np.array_equal(
        src.all_classes,
        np.concatenate([src.object_classes, src.distractor_classes]))


def test_visible_masks_are_disjoint(src):
    """z-buffer ownership: no pixel belongs to two instances."""
    gta = src.gt_masks_all(31)
    assert (gta.sum(axis=1) <= 1).all()


def test_depth_backprojects_onto_objects(src):
    """Visible mask pixels' depth backprojects into the object's bounding
    volume — the contract masks->clouds (`rt3d/geometry/ops.py`) uses."""
    idx = 13
    pkt = src.get(idx)
    centers = src.object_centers(idx)
    for c, cam in enumerate(src.cameras()):
        R = np.asarray(cam.extrinsics.R)
        t = np.asarray(cam.extrinsics.t)
        intr = cam.intrinsics
        gt = src.gt_masks(idx)
        for k in range(src.num_objects):
            ys, xs = np.nonzero(gt[c, k])
            if len(ys) < 16:
                continue
            d = pkt.depth[c][ys, xs]
            assert np.isfinite(d).all()
            pc = np.stack([(xs - intr.cx) / intr.fx * d,
                           (ys - intr.cy) / intr.fy * d, d], -1)
            pr = pc @ R.T + t
            # within the cylinder's radius+eps of the centre axis, z in
            # [0, height]
            r_max = max(src._objects[k].size[0], src._objects[k].size[1])
            dist_xy = np.linalg.norm(pr[:, :2] - centers[k][:2], axis=1)
            assert dist_xy.max() < r_max + 0.01
            assert pr[:, 2].min() > -0.01
            assert pr[:, 2].max() < src._objects[k].size[2] + 0.01


def test_occlusion_occurs_and_is_analytically_visible(src):
    """The seeded scene family produces real inter-object occlusion:
    some frame has a target with <80% of its solo-render pixels visible
    while still partially in view."""
    best = 1.0
    for f in range(0, 360, 4):
        vf = src.visible_fraction(f)
        m = vf[(vf > 0.02)].min() if (vf > 0.02).any() else 1.0
        best = min(best, float(m))
        if best < 0.8:
            break
    assert best < 0.8, f"no occlusion event found (min visible {best})"


def test_determinism_including_sensor_noise(src):
    a = src.get(42)
    b = SyntheticSource(num_cameras=2, num_frames=None, hw=HW,
                        num_objects=3, seed=5, domain="hard").get(42)
    assert np.array_equal(a.rgb, b.rgb)
    assert np.array_equal(np.nan_to_num(a.depth), np.nan_to_num(b.depth))
    # noise differs between frames (it is per-index seeded, not static)
    c = src.get(43)
    assert not np.array_equal(a.rgb, c.rgb)


def test_distractors_present_in_rgb_but_not_targets(src):
    """Distractor pixels render (clutter is visible) but are absent from
    `gt_masks` (targets only) and present in `gt_masks_all`."""
    gta = src.gt_masks_all(7)
    nd = len(src.distractor_classes)
    assert nd >= 1
    assert gta[:, 3:].sum() > 0  # distractors visible somewhere


def test_hard_cameras_are_tilted(src):
    """Oblique rig: the optical axis is NOT straight down (the easy
    domain's degenerate top-down view cannot produce occlusion)."""
    for cam in src.cameras():
        R = np.asarray(cam.extrinsics.R)
        fwd = R[:, 2]  # camera +z in robot frame
        assert fwd[2] < -0.5          # looking downward...
        assert abs(fwd[1]) > 0.2      # ...but tilted, not top-down


def test_easy_domain_unchanged():
    """domain='easy' keeps the original family: top-down rig, no
    distractors, amodal == visible (boxes never occlude top-down)."""
    s = SyntheticSource(num_cameras=2, num_frames=None, hw=HW,
                        num_objects=2, seed=3)
    assert s.domain == "easy"
    assert len(s.distractor_classes) == 0
    R = np.asarray(s.cameras()[0].extrinsics.R)
    assert np.allclose(R, np.diag([1.0, -1.0, -1.0]))
    assert np.array_equal(s.gt_masks(5), s.gt_masks_all(5))
    assert np.allclose(s.visible_fraction(5), 1.0)
    assert np.array_equal(s.object_classes, [39, 41])
