"""CLI-level smoke for every app entry point's argparse -> config ->
driver plumbing, which the pipeline-level tests bypass:

- `two_cam` with the full flag surface that has no other end-to-end
  wiring test — `--quantize` (live int8 calibration through
  maybe_quantize_params) and `--accumulate --accum-raw` (raw-ray
  accumulator feed). Reference analog: `2cam/2cams_mask_gpu.py`.
- `one_cam` with `--live` + `--save-ply` (spool publishing and the
  every-30-frames PLY export). Reference analog: `1cam/rt-tracking.py`.
- `track_only` (detection + tracking, per-box centre-depth overlay).
  Reference analog: `1cam/yolo11_tracking.py`.
- `record` then `plots` over the produced logs. Reference analog:
  `visualizer_fps.py` / `visualizer_performance.py`.
- `convert_weights` over a state_dict-compatible torch checkpoint
  (tests/torch_yolo.py oracle). Reference analog: the ultralytics
  `.pt` load at `2cam/2cams_mask_gpu.py:51`.
"""

import csv
import os
import sys

from tests.tiny import tiny_config


def test_two_cam_cli_quantize_accum_raw(tmp_path, monkeypatch):
    cfg_path = tmp_path / "tiny.json"
    tiny_config().to_json(str(cfg_path))

    from rt3d.apps import two_cam

    log_dir = tmp_path / "runs"
    monkeypatch.setattr(sys, "argv", [
        "two_cam", "--source", "synthetic", "--frames", "6",
        "--config", str(cfg_path), "--quantize",
        "--accumulate", "--accum-raw", "--tracker", "deepsort",
        "--warmup", "1", "--log-dir", str(log_dir),
    ])
    assert two_cam.main() == 0

    # the reference's two CSV logs in its schemas (timing.py)
    with open(log_dir / "fps_log.csv") as f:
        fps_rows = list(csv.reader(f))
    assert fps_rows[0] == ["Timestamp", "FPS"]
    assert len(fps_rows) >= 4  # header + frames
    with open(log_dir / "timings.csv") as f:
        timing_rows = list(csv.reader(f))
    assert timing_rows[0] == ["Step", "Timings"]
    assert len(timing_rows) > 1


def test_one_cam_cli_live_save_ply(tmp_path, monkeypatch):
    cfg_path = tmp_path / "tiny1.json"
    tiny_config(num_cameras=1).to_json(str(cfg_path))

    from rt3d.apps import one_cam

    log_dir = tmp_path / "runs1"
    spool = tmp_path / "spool"
    monkeypatch.setattr(sys, "argv", [
        "one_cam", "--source", "synthetic", "--frames", "4",
        "--config", str(cfg_path), "--warmup", "1",
        "--log-dir", str(log_dir), "--save-ply", "--live", str(spool),
        "--subsample", "1.0",
    ])
    assert one_cam.main() == 0
    # --save-ply exercises the on_frame export branch, but whether a
    # random-init model yields a nonempty object cloud is not a plumbing
    # property (detection quality is test_detection_loop's job) — assert
    # only the detection-independent artifacts
    assert (spool / "status.json").exists()
    with open(log_dir / "fps_log.csv") as f:
        rows = list(csv.reader(f))
    assert rows[0] == ["Timestamp", "FPS"]
    assert len(rows) >= 4  # header + frames


def test_track_only_cli(tmp_path, monkeypatch, capsys):
    cfg_path = tmp_path / "tiny1.json"
    # permissive conf so the random-init model emits at least one box
    tiny_config(num_cameras=1, conf=0.0).to_json(str(cfg_path))

    from rt3d.apps import track_only

    monkeypatch.setattr(sys, "argv", [
        "track_only", "--source", "synthetic", "--frames", "3",
        "--config", str(cfg_path), "--log-dir", str(tmp_path / "runs_t"),
    ])
    assert track_only.main() == 0
    out = capsys.readouterr().out
    assert "FPS" in out
    assert "depth@centre" in out  # 1cam/yolo11_tracking.py:89-111 overlay


def test_record_and_plots_cli(tmp_path, monkeypatch, capsys):
    from rt3d.apps import plots, record

    seq = tmp_path / "seq.rts"
    monkeypatch.setattr(sys, "argv", [
        "record", str(seq), "--frames", "3", "--cameras", "2",
        "--height", "96", "--width", "160",
    ])
    assert record.main() == 0
    assert "3 frames x 2 cams" in capsys.readouterr().out
    from rt3d.io.source import ReplaySource

    src = ReplaySource(str(seq))
    pkt = src.get(2)
    assert pkt.rgb.shape == (2, 96, 160, 3)

    # plots over a real run's CSV schema (tiny hand-rolled logs)
    log_dir = tmp_path / "runs_p"
    log_dir.mkdir()
    with open(log_dir / "fps_log.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Timestamp", "FPS"])
        for i in range(20):
            w.writerow([f"{i * 0.033:.3f}", f"{30 + (i % 3)}"])
    with open(log_dir / "timings.csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["Step", "Timings"])
        for s, t in [("frame_retrieval", 0.002), ("inference", 0.01),
                     ("fusion", 0.001)]:
            for _ in range(4):
                w.writerow([s, t])
    monkeypatch.setattr(sys, "argv", ["plots", "--log-dir", str(log_dir)])
    assert plots.main() == 0
    made = os.listdir(log_dir / "plots")
    assert "fps_over_time_smoothed_30s.png" in made
    assert "average_timing_per_step.png" in made


def test_viewer_cli_once_headless(tmp_path, monkeypatch, capsys):
    """`viewer --once` headless render over a spool written by the live
    publisher (reference analog: the Open3D/cv2 windows in `2cams.py:165`,
    read-side). ViewerState internals are covered by test_viewer; this
    pins the argparse/poll-loop wiring."""
    import json

    monkeypatch.delenv("DISPLAY", raising=False)
    spool = tmp_path / "spool"
    spool.mkdir()
    with open(spool / "status.json", "w") as f:
        json.dump({"frame": 7, "fps": 12.5, "objects": 2,
                   "workspace_points": 345}, f)

    from rt3d.apps import viewer

    monkeypatch.setattr(sys, "argv", ["viewer", str(spool), "--once"])
    assert viewer.main() == 0
    out = capsys.readouterr().out
    assert "frame 7" in out and "12.5 FPS" in out


def test_convert_weights_cli(tmp_path, monkeypatch, capsys):
    torch = __import__("pytest").importorskip("torch")
    import numpy as np

    from tests import torch_yolo

    torch.manual_seed(0)
    tm = torch_yolo.SegModel("n", 80)
    torch_yolo.populate_bn_stats(tm, seed=0, hw=(64, 96))
    ckpt = tmp_path / "yolo11n-seg.pt"
    torch.save({"model": tm, "epoch": -1}, str(ckpt))

    from rt3d.apps import convert_weights

    out = tmp_path / "yolo11n-seg.npz"
    monkeypatch.setattr(sys, "argv", [
        "convert_weights", str(ckpt), "--variant", "n",
        "--input-hw", "64,96", "--out", str(out),
    ])
    assert convert_weights.main() == 0
    assert "exact 1:1 coverage" in capsys.readouterr().out
    with np.load(str(out)) as z:
        assert len(z.files) > 100  # full parameter tree on disk
