"""Synthetic analytic scene source: a tabletop with moving objects.

Serves two roles the reference fills with live hardware:
  * benchmark input with the exact tensor shapes/dtypes of ZED HD720
    capture (RGB u8 + f32 depth) when no recorded sequence is available;
  * golden-test input, since ground-truth instance masks and object
    geometry are known analytically (`gt_masks`).

The scene: two cameras look down at a z=0 table plane; `num_objects`
box-shaped objects glide across it with per-object phase. Depth is exact;
RGB is a flat-shaded rendering (enough to exercise the full image path).
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import numpy as np

from rt3d.config import CameraConfig, Extrinsics, Intrinsics
from rt3d.io.source import FramePacket


class SyntheticSource:
    def __init__(
        self,
        num_cameras: int = 2,
        num_frames: Optional[int] = 300,
        hw: Tuple[int, int] = (720, 1280),
        num_objects: int = 1,
        cam_height_m: float = 1.0,
        object_size_m: Tuple[float, float, float] = (0.06, 0.08, 0.12),
        seed: int = 0,
    ):
        self._n_cams = num_cameras
        self._n_frames = num_frames
        self._hw = hw
        self.num_objects = num_objects
        self.cam_height = cam_height_m
        self.obj_size = object_size_m
        h, w = hw
        f = 0.55 * w  # ~ZED HD720 focal in pixels at this width
        self._intr = Intrinsics(fx=f, fy=f, cx=w / 2, cy=h / 2, width=w, height=h)
        rng = np.random.default_rng(seed)
        self._phases = rng.uniform(0, 2 * math.pi, num_objects)
        self._speeds = rng.uniform(0.5, 1.0, num_objects)
        # camera i sits above the table, slightly offset, looking straight
        # down (rotation maps cam axes -> robot axes: x->x, y->-y, z->-z)
        self._cams: List[CameraConfig] = []
        for i in range(num_cameras):
            off = (i - (num_cameras - 1) / 2) * 0.08
            ext = Extrinsics(
                rotation=((1.0, 0.0, 0.0), (0.0, -1.0, 0.0), (0.0, 0.0, -1.0)),
                translation=(0.25 + off, 0.6, cam_height_m),
            )
            self._cams.append(
                CameraConfig(name=f"cam{i+1}", intrinsics=self._intr,
                             extrinsics=ext, serial=1000 + i)
            )

    # -- FrameSource ------------------------------------------------------

    @property
    def num_cameras(self) -> int:
        return self._n_cams

    @property
    def num_frames(self) -> Optional[int]:
        return self._n_frames

    @property
    def frame_hw(self) -> Tuple[int, int]:
        return self._hw

    def cameras(self) -> List[CameraConfig]:
        return list(self._cams)

    def close(self) -> None:
        pass

    # -- scene model ------------------------------------------------------

    def object_centers(self, index: int) -> np.ndarray:
        """(N, 3) object centres in the robot frame at a given frame."""
        t = index / 30.0
        out = np.zeros((self.num_objects, 3), np.float32)
        for k in range(self.num_objects):
            ph = self._phases[k] + self._speeds[k] * t
            out[k] = [
                0.25 + 0.15 * math.cos(ph),
                0.6 + 0.2 * math.sin(ph) + 0.25 * k / max(self.num_objects, 1),
                self.obj_size[2] / 2,
            ]
        return out

    def _render_camera(self, cam: CameraConfig, centers: np.ndarray):
        h, w = self._hw
        intr = cam.intrinsics
        R, t = cam.extrinsics.R, cam.extrinsics.t
        # camera looks along +z(cam) = -z(robot); table plane z_robot=0 is at
        # depth = cam height. Ray through pixel (u, v): direction d_cam =
        # ((u-cx)/fx, (v-cy)/fy, 1); in robot frame dz = (R @ d_cam)[2].
        us = (np.arange(w, dtype=np.float32) - intr.cx) / intr.fx
        vs = (np.arange(h, dtype=np.float32) - intr.cy) / intr.fy
        du, dv = np.meshgrid(us, vs)
        d_cam = np.stack([du, dv, np.ones_like(du)], axis=-1)  # (H, W, 3)
        d_rob = d_cam @ R.T
        # table: t_z + s * dz = 0 -> s = -t_z / dz ; depth(z_cam) = s (unit
        # z-component in cam frame) since d_cam z == 1.
        dz = d_rob[..., 2]
        s_table = np.where(dz < -1e-6, -t[2] / np.minimum(dz, -1e-6), np.inf)
        depth = s_table.astype(np.float32)
        rgb = np.full((h, w, 3), 90, np.uint8)  # grey table

        masks = np.zeros((len(centers), h, w), bool)
        sx, sy, sz = self.obj_size
        for k, c in enumerate(centers):
            # top face of the box at z = sz: s = (sz - t_z)/dz
            s_top = np.where(dz < -1e-6, (sz - t[2]) / np.minimum(dz, -1e-6), np.inf)
            px = t[0] + s_top * d_rob[..., 0]
            py = t[1] + s_top * d_rob[..., 1]
            hit = (
                (np.abs(px - c[0]) <= sx / 2)
                & (np.abs(py - c[1]) <= sy / 2)
                & (s_top < depth)
            )
            depth = np.where(hit, s_top.astype(np.float32), depth)
            masks[k] = hit
            color = np.array([40 + 50 * k % 200, 160, 220], np.uint8)
            rgb[hit] = color
        depth = np.where(np.isfinite(depth), depth, np.nan).astype(np.float32)
        return rgb, depth, masks

    def get(self, index: int) -> FramePacket:
        centers = self.object_centers(index)
        rgbs, depths = [], []
        for cam in self._cams:
            rgb, depth, _ = self._render_camera(cam, centers)
            rgbs.append(rgb)
            depths.append(depth)
        return FramePacket(
            rgb=np.stack(rgbs), depth=np.stack(depths),
            status=np.zeros(self._n_cams, np.uint32), index=index,
        )

    def gt_masks(self, index: int) -> np.ndarray:
        """(C, N, H, W) ground-truth instance masks (golden-test oracle)."""
        centers = self.object_centers(index)
        out = []
        for cam in self._cams:
            _, _, masks = self._render_camera(cam, centers)
            out.append(masks)
        return np.stack(out)
