"""Micro-profiling of pipeline sub-pieces on the TPU."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from rt3d.config import reference_2cam_config
from rt3d.io.synthetic import SyntheticSource
from rt3d.pipeline.step import CameraCalib, build_pipeline


def timeit(name, fn, *args, n=5):
    fn(*args)  # compile
    jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1000
    print(f"  {name:34s} {dt:8.2f} ms")
    return out


def main():
    import dataclasses

    cfg = reference_2cam_config()
    cfg = dataclasses.replace(cfg, model=dataclasses.replace(cfg.model, variant="n"))
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    calib = CameraCalib.from_config(cfg)
    src = SyntheticSource(num_cameras=2, num_frames=2, hw=(720, 1280))
    pkt = src.get(0)
    rgb = jnp.asarray(pkt.rgb)
    depth = jnp.asarray(pkt.depth)

    print("== pieces ==")
    images = timeit("preprocess", jax.jit(pipe.preprocess), rgb)
    fwd = jax.jit(pipe.model.forward)
    timeit("model.forward (n)", fwd, params, images)
    det, protos = timeit("detect (fwd+decode+nms)", jax.jit(pipe.detect), params, images)
    state = pipe.init_state()
    timeit("track (bytetrack x2)", jax.jit(pipe.track), state, det)
    masks = timeit("mask assembly", jax.jit(pipe.masks), protos, det)
    ids = jnp.full((2, cfg.model.max_detections), -1, jnp.int32)
    timeit("object_clouds (sort path)", jax.jit(pipe.object_clouds),
           depth, masks, det, ids, calib)
    ws = timeit("workspace_clouds", jax.jit(pipe.workspace_clouds), depth, calib)
    objs, _ = jax.jit(pipe.object_clouds)(depth, masks, det, ids, calib)
    fused = timeit("fuse (+SOR)", jax.jit(pipe.fuse), objs)
    from rt3d.geometry.ops import PointBuffer

    ws_all = PointBuffer(points=ws[0].points.reshape(-1, 3),
                         valid=ws[0].valid.reshape(-1))
    timeit("subtract", jax.jit(pipe.subtract), ws_all, fused[1])

    # micro: raw sort costs
    print("== primitives ==")
    n = 921600
    k1 = jnp.arange(n, dtype=jnp.int32)[::-1]
    k2 = jnp.ones((n,), jnp.int32)
    k3 = jnp.ones((n,), jnp.int32)
    pay = jnp.arange(n, dtype=jnp.int32)
    timeit("lex sort 3keys+payload 921600",
           jax.jit(lambda a, b, c, d: jax.lax.sort((a, b, c, d), num_keys=3)),
           k1, k2, k3, pay)
    timeit("sort 1key+payload 921600",
           jax.jit(lambda a, d: jax.lax.sort((a, d), num_keys=1)), k1, pay)
    ku = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 30, jnp.int32)
    timeit("sort 1key+payload random",
           jax.jit(lambda a, d: jax.lax.sort((a, d), num_keys=1)), ku, pay)
    m = jax.random.uniform(jax.random.PRNGKey(0), (20, n)) < 0.01
    timeit("cumsum (20, 921600) i32",
           jax.jit(lambda x: jnp.cumsum(x.astype(jnp.int32), axis=1)), m)
    timeit("gather masks by order (20,921600)",
           jax.jit(lambda x, o: jnp.take(x, o, axis=1)), m, pay)
    d2 = jax.random.uniform(jax.random.PRNGKey(1), (2048, 2048))
    timeit("top_k k=20 on (2048,2048)",
           jax.jit(lambda x: jax.lax.top_k(x, 20)), d2)
    # empty-ish step dispatch overhead
    timeit("null jit (dispatch overhead)", jax.jit(lambda x: x + 1), jnp.zeros(8))
    return 0


if __name__ == "__main__":
    sys.exit(main())
