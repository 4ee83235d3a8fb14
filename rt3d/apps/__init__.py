"""CLI entry points — the rt3d analogs of the reference's L2 scripts.

  python -m rt3d.apps.two_cam    ~ 2cam/2cams.py / 2cams_mask_gpu.py
  python -m rt3d.apps.one_cam    ~ 1cam/rt-tracking.py
  python -m rt3d.apps.track_only ~ 1cam/yolo11_tracking.py
  python -m rt3d.apps.record     ~ (new) sequence recorder
  python -m rt3d.apps.plots      ~ 2cam/visualizer_fps.py + visualizer_performance.py
"""
