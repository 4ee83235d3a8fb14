"""Point-cloud scene export (external-viewer analog of the reference's
in-process Open3D windows, `1cam/rt-tracking.py:157-285`)."""

from __future__ import annotations

from typing import Optional

import numpy as np


def save_ply(path: str, points: np.ndarray, colors: Optional[np.ndarray] = None) -> str:
    """Write an ASCII PLY any viewer (Open3D, MeshLab, CloudCompare) opens."""
    pts = np.asarray(points, np.float32)
    n = len(pts)
    has_c = colors is not None
    with open(path, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {n}\n")
        f.write("property float x\nproperty float y\nproperty float z\n")
        if has_c:
            f.write("property uchar red\nproperty uchar green\nproperty uchar blue\n")
        f.write("end_header\n")
        for i in range(n):
            row = f"{pts[i,0]} {pts[i,1]} {pts[i,2]}"
            if has_c:
                c = colors[i]
                row += f" {int(c[0])} {int(c[1])} {int(c[2])}"
            f.write(row + "\n")
    return path
