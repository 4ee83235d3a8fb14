"""Latency-mode lever 5 prototype: a device-RESIDENT pipeline loop.

In scan=1 latency mode every frame pays one full dispatch+fetch round
trip (~25 ms each through the dev-tunnel relay; NOTES.md "dispatch path"
table) — the device step itself is ~3-7 ms, so a robot-control consumer
sees ~30 FPS where the chip could do >150.  This prototype keeps ONE
jitted program resident for N frames: a `lax.fori_loop` whose body pulls
the next frame pair from the host via ordered `io_callback`, runs the
full fused pipeline step, and pushes a compact result (track ids +
workspace voxel count + object centroids) back to the host via a second
`io_callback`.  If the host round trips inside a resident program are
cheaper than whole-dispatch round trips, this is the latency mode; if the
relay charges the same toll per callback, the lever is dead — either way
the measurement gets recorded (NOTES.md keep/kill).

Usage (TPU):
    PYTHONPATH=/root/repo:$PYTHONPATH python tools/persistent_loop.py \
        [--frames 48] [--variant n]
"""

from __future__ import annotations

import argparse
import os
import queue
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--frames", type=int, default=48)
    p.add_argument("--variant", default="n")
    p.add_argument("--trained", action="store_true", default=True)
    p.add_argument("--out", default=None,
                   help="write a JSON evidence record here (e.g. "
                        "runs_chip/persistent_loop.json)")
    args = p.parse_args()
    record = {"tool": "persistent_loop", "variant": args.variant,
              "frames": args.frames}

    def _emit(rc):
        if args.out:
            import json
            with open(args.out, "w") as f:
                json.dump(record, f, indent=2)
        return rc

    import numpy as np
    import jax
    import jax.numpy as jnp

    if not os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/rt3d_jax_cache_tpu")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

    import dataclasses

    from rt3d.config import reference_2cam_config, with_cameras
    from rt3d.io.synthetic import SyntheticSource
    from rt3d.pipeline.step import CameraCalib, build_pipeline

    cfg = reference_2cam_config()
    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, variant=args.variant))
    src = SyntheticSource(num_cameras=2, num_frames=8, hw=(720, 1280),
                          num_objects=1)
    cfg = with_cameras(cfg, src.cameras())
    pipe = build_pipeline(cfg)
    params = pipe.model.init(jax.random.PRNGKey(0))
    wpath = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "weights",
        f"yolo11{args.variant}_synth_seg.npz")
    if args.trained and os.path.exists(wpath):
        from rt3d.models.yolo.convert import load_params

        params = {k: jnp.asarray(v, jnp.float32)
                  for k, v in load_params(wpath).items()}
    calib = CameraCalib.from_config(cfg)
    packets = [src.get(i) for i in range(8)]
    c, h, w = 2, 720, 1280

    # ---- host side: frame feeder + result sink ------------------------
    res_q: "queue.Queue[tuple]" = queue.Queue()
    feed_i = [0]
    t_feed = []

    def host_next_frame():
        t_feed.append(time.perf_counter())
        pkt = packets[feed_i[0] % len(packets)]
        feed_i[0] += 1
        return (np.asarray(pkt.rgb, np.uint8),
                np.asarray(pkt.depth, np.float32))

    def host_emit(ids, nvox):
        res_q.put((time.perf_counter(), np.asarray(ids), int(nvox)))
        return np.int32(0)

    from jax.experimental import io_callback

    rgb_shape = jax.ShapeDtypeStruct((c, h, w, 3), jnp.uint8)
    depth_shape = jax.ShapeDtypeStruct((c, h, w), jnp.float32)

    def resident(params, state, calib, n):
        def body(_, st):
            rgb, depth = io_callback(
                host_next_frame, (rgb_shape, depth_shape), ordered=True)
            st, out = pipe.step(params, st, rgb, depth, calib)
            nvox = out.workspace.valid.sum().astype(jnp.int32)
            io_callback(host_emit, jax.ShapeDtypeStruct((), jnp.int32),
                        out.track_ids, nvox, ordered=True)
            return st
        return jax.lax.fori_loop(0, n, body, state)

    run = jax.jit(resident, static_argnames=("n",))

    # ---- baseline: the per-dispatch latency path ----------------------
    step = jax.jit(pipe.step)
    st = pipe.init_state()
    st, out = step(params, st, jnp.asarray(packets[0].rgb),
                   jnp.asarray(packets[0].depth), calib)
    jax.block_until_ready(out.workspace.valid)
    t0 = time.perf_counter()
    n_base = min(24, args.frames)
    for i in range(n_base):
        pkt = packets[i % len(packets)]
        st, out = step(params, st, jnp.asarray(pkt.rgb),
                       jnp.asarray(pkt.depth), calib)
        # a latency consumer reads the result every frame:
        _ = np.asarray(out.track_ids)
    dt = time.perf_counter() - t0
    fps_dispatch = n_base / dt
    print(f"dispatch path (blocking fetch/frame): {fps_dispatch:.2f} FPS "
          f"({1000 * dt / n_base:.1f} ms/frame)", flush=True)
    record["dispatch_fps"] = round(fps_dispatch, 2)
    record["dispatch_ms_per_frame"] = round(1000 * dt / n_base, 1)

    # ---- resident loop ------------------------------------------------
    print("compiling resident loop ...", flush=True)
    try:
        st2 = pipe.init_state()
        t0 = time.perf_counter()
        final = run(params, st2, calib, args.frames)
        jax.block_until_ready(jax.tree_util.tree_leaves(final)[0])
        dt = time.perf_counter() - t0
        got = []
        while not res_q.empty():
            got.append(res_q.get())
        # first-call wall time includes compile; measure a second pass
        feed_i[0] = 0
        t_feed.clear()
        st2 = pipe.init_state()
        t0 = time.perf_counter()
        final = run(params, st2, calib, args.frames)
        jax.block_until_ready(jax.tree_util.tree_leaves(final)[0])
        dt = time.perf_counter() - t0
        got = []
        while not res_q.empty():
            got.append(res_q.get())
        fps_res = args.frames / dt
        lat = np.diff([t for t, _, _ in got]) * 1000 if len(got) > 2 else []
        print(f"resident loop: {fps_res:.2f} FPS "
              f"({1000 * dt / args.frames:.1f} ms/frame) over "
              f"{args.frames} frames; {len(got)} results; "
              f"inter-result ms p50={np.median(lat):.1f} "
              f"p90={np.percentile(lat, 90):.1f}" if len(lat) > 0 else
              f"resident loop: {fps_res:.2f} FPS, {len(got)} results",
              flush=True)
        verdict = "KEEP" if fps_res > 1.3 * fps_dispatch else "KILL"
        print(f"verdict: {verdict} (resident {fps_res:.2f} vs dispatch "
              f"{fps_dispatch:.2f} FPS)")
        record["resident_fps"] = round(fps_res, 2)
        record["results_received"] = len(got)
        if len(lat) > 0:
            record["inter_result_ms_p50"] = round(float(np.median(lat)), 1)
            record["inter_result_ms_p90"] = round(
                float(np.percentile(lat, 90)), 1)
        record["verdict"] = verdict
    except Exception as e:
        print(f"resident loop FAILED: {type(e).__name__}: {e}")
        print("verdict: KILL (io_callback path unsupported on this "
              "backend/relay)")
        record["verdict"] = "KILL"
        record["error"] = f"{type(e).__name__}: {e}"[:200]
        return _emit(1)
    return _emit(0)


if __name__ == "__main__":
    raise SystemExit(main())
