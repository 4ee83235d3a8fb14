"""rt3d — TPU-native real-time multi-camera 3D reconstruction framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
janfrischi/RT-3D-Reconstruction (reference mounted at /root/reference):
YOLO11 instance segmentation + ByteTrack ID tracking, mask-gated depth
back-projection into per-object point clouds, voxel downsampling, statistical
outlier removal, workspace cropping, rigid transforms into the robot base
frame, centroid-distance multi-camera fusion, and workspace subtraction —
expressed as fixed-shape jitted steps on padded point buffers, with camera
streams sharded over a `jax.sharding.Mesh`.

Layering (bottom-up):
  geometry/  — jitted point-cloud ops on padded fixed-shape buffers
  models/    — Flax YOLO11-seg (n/s/m/l/x) + static-shape post-processing
  tracking/  — vectorized ByteTrack / BoT-SORT with fixed track slots
  io/        — FrameSource ABI: replay (mmap / C++), synthetic, recorder
  pipeline/  — per-camera jitted step, multi-camera fusion step
  parallel/  — mesh construction, sharding rules, collectives helpers
  runtime/   — step driver loop, per-stage timing capture, CSV schemas
  train/     — loss + sharded train step (dp/fsdp) for fine-tuning
  viz/       — host-side annotation + CSV plotters (off the hot path)
  bench/     — replay benchmark harness vs reference BASELINE numbers
"""

__version__ = "0.1.0"
