"""IO tests: .rts format round-trip, native vs memmap replay, synthetic."""

import numpy as np
import pytest

from rt3d.io import ReplaySource, SyntheticSource, read_header, write_sequence
from rt3d.io.format import camera_meta


def _small_sequence(tmp_path, frames=4, cams=2, h=24, w=32):
    rng = np.random.default_rng(0)
    rgb = rng.integers(0, 255, (frames, cams, h, w, 3), dtype=np.uint8)
    depth = rng.uniform(0.3, 3.0, (frames, cams, h, w)).astype(np.float32)
    depth[0, 0, 0, 0] = np.nan
    status = np.zeros((frames, cams), np.uint32)
    status[2, 1] = 7  # a bad frame
    meta = {
        "cameras": [
            camera_meta(500.0, 500.0, w / 2, h / 2,
                        [[1, 0, 0], [0, 1, 0], [0, 0, 1]], [0, 0, 0], serial=i)
            for i in range(cams)
        ]
    }
    path = str(tmp_path / "seq.rts")
    write_sequence(path, rgb, depth, meta, status)
    return path, rgb, depth, status


def test_rts_roundtrip_memmap(tmp_path):
    path, rgb, depth, status = _small_sequence(tmp_path)
    spec = read_header(path)
    assert (spec.n_cams, spec.n_frames, spec.height, spec.width) == (2, 4, 24, 32)
    src = ReplaySource(path, use_native=False)
    assert src.backend == "memmap"
    for f in range(4):
        pkt = src.get(f)
        np.testing.assert_array_equal(pkt.rgb, rgb[f])
        np.testing.assert_array_equal(
            np.nan_to_num(pkt.depth), np.nan_to_num(depth[f])
        )
        np.testing.assert_array_equal(pkt.status, status[f])
    cams = src.cameras()
    assert len(cams) == 2 and cams[0].intrinsics.fx == 500.0
    src.close()


def test_rts_native_matches_memmap(tmp_path):
    path, rgb, depth, status = _small_sequence(tmp_path)
    native = ReplaySource(path, use_native=True)
    if native.backend != "native":
        pytest.skip("native replayer unavailable (no g++?)")
    mem = ReplaySource(path, use_native=False)
    for f in range(4):
        a, b = native.get(f), mem.get(f)
        np.testing.assert_array_equal(a.rgb, b.rgb)
        np.testing.assert_array_equal(
            np.nan_to_num(a.depth), np.nan_to_num(b.depth)
        )
        np.testing.assert_array_equal(a.status, b.status)
    native.close()
    mem.close()


def test_replay_loop_and_bounds(tmp_path):
    path, rgb, *_ = _small_sequence(tmp_path)
    src = ReplaySource(path, use_native=False, loop=True)
    np.testing.assert_array_equal(src.get(5).rgb, rgb[1])  # 5 % 4
    src.close()
    src = ReplaySource(path, use_native=False)
    with pytest.raises(IndexError):
        src.get(4)
    src.close()


def test_synthetic_scene_physics():
    src = SyntheticSource(num_cameras=2, num_frames=10, hw=(90, 160), num_objects=2)
    pkt = src.get(0)
    assert pkt.rgb.shape == (2, 90, 160, 3)
    assert pkt.depth.shape == (2, 90, 160)
    # table plane: depth ~ cam height at image centre (camera looks down)
    assert abs(pkt.depth[0, 45, 40] - 1.0) < 0.15
    masks = src.gt_masks(0)
    assert masks.shape == (2, 2, 90, 160)
    assert masks.any(), "objects should be visible"
    # object pixels are nearer than the table
    m = masks[0].any(axis=0)
    if m.any():
        assert np.nanmean(pkt.depth[0][m]) < np.nanmean(pkt.depth[0][~m])
    # objects move over time
    assert (src.object_centers(0) != src.object_centers(9)).any()


def test_synthetic_to_rts_roundtrip(tmp_path):
    src = SyntheticSource(num_cameras=2, num_frames=3, hw=(48, 64))
    frames = [src.get(i) for i in range(3)]
    rgb = np.stack([f.rgb for f in frames])
    depth = np.stack([f.depth for f in frames])
    meta = {
        "cameras": [
            camera_meta(
                c.intrinsics.fx, c.intrinsics.fy, c.intrinsics.cx, c.intrinsics.cy,
                [list(r) for r in c.extrinsics.rotation],
                list(c.extrinsics.translation), serial=c.serial,
            )
            for c in src.cameras()
        ]
    }
    path = str(tmp_path / "synth.rts")
    write_sequence(path, rgb, depth, meta)
    rep = ReplaySource(path, use_native=False)
    np.testing.assert_array_equal(rep.get(1).rgb, rgb[1])
    got = rep.cameras()[1].extrinsics.R
    np.testing.assert_allclose(got, src.cameras()[1].extrinsics.R)
    rep.close()
