"""Per-stage TPU timing of the pipeline (stage-split jits, blocking)."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.config import reference_2cam_config
from rt3d.io.synthetic import SyntheticSource
from rt3d.pipeline.step import CameraCalib, build_pipeline
from rt3d.runtime.driver import PipelineDriver


def main() -> int:
    import dataclasses

    variant = os.environ.get("RT3D_DEMO_VARIANT", "n")
    frames = int(os.environ.get("RT3D_DEMO_FRAMES", "10"))
    cfg = reference_2cam_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, variant=variant))
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    src = SyntheticSource(num_cameras=2, num_frames=4, hw=(720, 1280), num_objects=1)
    packets = [src.get(i) for i in range(4)]

    class Pre:
        def get(self, i):
            return packets[i % len(packets)]

    driver = PipelineDriver(pipe, params, mode="profile")
    res = driver.run(Pre(), num_frames=frames, warmup=2)
    print(f"mean_fps={res.mean_fps:.2f}")
    for k, v in sorted(res.summary_ms.items(), key=lambda kv: -kv[1]):
        print(f"  {k:28s} {v:8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
