"""The L4 observability loop proven end to end, not per-unit (VERDICT r1 #5):

record a synthetic sequence to .rts -> replay it through the C++ mmap
replayer -> run the full pipeline driver with CSV logging -> load the CSVs
with the same loader that reads the reference's own RTX-4090 logs
(`/root/reference/2cam/fps_log.csv`, `timings.csv`) and render the
comparison table. One chain, every seam exercised.

CLI equivalent (same code path, HD720 on the TPU chip): `make e2e`.
"""

import csv
import os

import numpy as np
import jax
import pytest

from rt3d.config import with_cameras
from rt3d.io.format import camera_meta, write_sequence
from rt3d.io.source import ReplaySource
from rt3d.io.synthetic import SyntheticSource
from rt3d.pipeline.step import build_pipeline
from rt3d.runtime.driver import PipelineDriver
from tests.tiny import H, W, tiny_config

REF_LOG_DIR = "/root/reference/2cam"
FRAMES = 6


def _record(path: str) -> None:
    """What `rt3d.apps.record` does, at test scale."""
    src = SyntheticSource(num_cameras=2, num_frames=FRAMES, hw=(H, W),
                          num_objects=1)
    rgb = np.zeros((FRAMES, 2, H, W, 3), np.uint8)
    depth = np.zeros((FRAMES, 2, H, W), np.float32)
    for i in range(FRAMES):
        pkt = src.get(i)
        rgb[i] = pkt.rgb
        depth[i] = pkt.depth
    meta = {
        "cameras": [
            camera_meta(
                c.intrinsics.fx, c.intrinsics.fy, c.intrinsics.cx,
                c.intrinsics.cy,
                [list(r) for r in c.extrinsics.rotation],
                list(c.extrinsics.translation), serial=c.serial, fps=c.fps,
            )
            for c in src.cameras()
        ],
    }
    write_sequence(path, rgb, depth, meta)


def test_recorded_replay_end_to_end(tmp_path):
    seq = str(tmp_path / "seq.rts")
    _record(seq)

    src = ReplaySource(seq, use_native=True)
    assert src.backend == "native", "C++ replayer must carry the replay path"
    assert src.num_frames == FRAMES and src.num_cameras == 2

    # calibration flows from the recording, like the reference reads the
    # ZED factory calibration at startup (`2cams.py:90-124`)
    cfg = with_cameras(tiny_config(), src.cameras())
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))

    log_dir = tmp_path / "runs"
    os.makedirs(log_dir)
    fps_csv = str(log_dir / "fps_log.csv")
    tim_csv = str(log_dir / "timings.csv")
    driver = PipelineDriver(pipe, params, mode="fused", pipeline_depth=2,
                            fps_log_path=fps_csv, timings_path=tim_csv)
    res = driver.run(src, num_frames=FRAMES, warmup=1)
    src.close()
    assert res.skipped_frames == 0
    assert res.mean_fps > 0

    # artifacts: the reference's exact CSV schemas
    with open(fps_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Timestamp", "FPS"]
    assert len(rows) == 1 + FRAMES
    assert all(float(r[1]) > 0 for r in rows[1:])

    with open(tim_csv) as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Step", "Timings"]
    stages = {r[0] for r in rows[1:]}
    assert "Total Time per Iteration" in stages
    assert "Frame Retrieval" in stages

    # the comparison harness loads OUR run and the REFERENCE's shipped logs
    # with one loader and renders the table
    from rt3d.bench.compare import compare_runs, load_run_summary

    ours = load_run_summary(str(log_dir), "ours")
    assert np.isfinite(ours.fps_mean) and ours.fps_mean > 0

    if not os.path.isdir(REF_LOG_DIR):
        pytest.skip("reference logs not present on this machine")
    ref = load_run_summary(REF_LOG_DIR, "ref")
    # the RTX-4090 logged run averaged ~23.8 FPS (BASELINE.md) — prove we
    # really parsed the reference's own artifact, not an empty frame
    assert 15.0 < ref.fps_mean < 35.0
    table = compare_runs(str(log_dir))
    assert "FPS mean" in table and "YOLO11 Inference (ms)" in table
