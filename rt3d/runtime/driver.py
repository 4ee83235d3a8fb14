"""The host-side step driver: feed frames, run the jitted step, log.

Replaces the reference's `while key != ord('q')` loops
(`2cam/2cams_mask_gpu.py:176-455`). Two execution modes:

* `fused` (benchmark): one jitted program per frame-pair; the host measures
  end-to-end latency only (per-stage rows come from the profiler or the
  `profile` mode).
* `profile`: stage-split jitted pieces with `block_until_ready` between, so
  every reference `timings.csv` stage gets an apples-to-apples number. This
  is slower than `fused` by construction (it forbids cross-stage overlap).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from rt3d.pipeline.step import CameraCalib, FrameOutputs, Pipeline
from rt3d.runtime.timing import TimingLog


@dataclass
class DriverResult:
    frames: int
    mean_fps: float
    median_fps: float
    max_fps: float
    summary_ms: Dict[str, float]
    last_outputs: Optional[FrameOutputs] = None
    skipped_frames: int = 0


class PipelineDriver:
    def __init__(
        self,
        pipeline: Pipeline,
        params,
        mode: str = "fused",
        fps_log_path: Optional[str] = None,
        timings_path: Optional[str] = None,
        donate_state: bool = True,
        pipeline_depth: int = 1,
        frames_per_dispatch: int = 1,
    ):
        # pipeline_depth > 1 overlaps host dispatch with device compute
        # (classic double-buffering: block on frame i-(depth-1) while frame
        # i runs). Adds depth-1 frames of latency; raises throughput by
        # hiding the per-dispatch tunnel cost. depth=1 == reference
        # semantics (full sync per frame).
        #
        # frames_per_dispatch > 1 (throughput mode) runs K frames per jitted
        # call via `Pipeline.step_scan`, amortizing per-call host overhead K
        # ways at K-1 extra frames of latency. Only meaningful on recorded
        # replays — a live camera delivers one frame at a time.
        self.pipeline_depth = max(1, pipeline_depth)
        self.frames_per_dispatch = max(1, frames_per_dispatch)
        if self.frames_per_dispatch > 1 and mode != "fused":
            raise ValueError("frames_per_dispatch requires mode='fused'")
        self.pipeline = pipeline
        # Pre-cast f32 conv kernels to the compute dtype once at
        # construction instead of inside every step — bit-identical
        # (conv2d rounded them per step anyway) and drops ~125 MB of
        # per-step f32->bf16 convert traffic for yolo11x (chip trace:
        # the largest non-conv fusion, 0.45 ms of a 6.6 ms step).
        from rt3d.models.yolo.core import cast_params_for_inference

        self.params = cast_params_for_inference(params)
        self.mode = mode
        self.calib = CameraCalib.from_config(pipeline.cfg)
        self.state = pipeline.init_state()
        self.log = TimingLog(fps_log_path, timings_path)
        p = pipeline

        if mode == "fused":
            self._step = jax.jit(
                p.step, donate_argnums=(1,) if donate_state else ()
            )
            if self.frames_per_dispatch > 1:
                self._step_scan = jax.jit(
                    p.step_scan, donate_argnums=(1,) if donate_state else ()
                )
        elif mode == "profile":
            self._preprocess = jax.jit(p.preprocess)
            self._detect = jax.jit(p.detect)
            self._track = jax.jit(p.track, donate_argnums=(0,) if donate_state else ())
            self._masks = jax.jit(p.masks)
            self._object_clouds = jax.jit(p.object_clouds)
            self._workspace = jax.jit(p.workspace_clouds)
            self._fuse = jax.jit(p.fuse)
            self._subtract = jax.jit(p.subtract)
        else:
            raise ValueError(f"unknown driver mode {mode}")

    # ------------------------------------------------------------------

    def _run_fused(self, rgb, depth):
        self.state, out = self._step(self.params, self.state, rgb, depth, self.calib)
        return out

    def _run_profiled(self, rgb, depth):
        from rt3d.geometry.ops import PointBuffer

        log = self.log
        with log.span("YOLO11 Inference"):
            images = self._preprocess(rgb)
            det, protos, emb = self._detect(self.params, images)
            self.state, ids = self._track(self.state, det, emb, images)
            jax.block_until_ready(ids)
        with log.span("Mask Processing"):
            masks = self._masks(protos, det)
            objs, _ = self._object_clouds(depth, masks, det, ids, self.calib)
            jax.block_until_ready(objs.points)
        with log.span("Point Cloud Processing"):
            ws, _ = self._workspace(depth, self.calib)
            jax.block_until_ready(ws.points)
        with log.span("Point Cloud Fusion"):
            fused, flat, _ = self._fuse(objs)
            jax.block_until_ready(flat.points)
        with log.span("Subtraction"):
            ws_all = PointBuffer(
                points=ws.points.reshape(-1, 3), valid=ws.valid.reshape(-1)
            )
            ws_out = self._subtract(ws_all, flat)
            jax.block_until_ready(ws_out.valid)
        return FrameOutputs(
            detections=det, track_ids=ids, objects=fused, objects_flat=flat,
            workspace=ws_out, per_camera_objects=objs,
            overflow=jnp.zeros((), jnp.int32),
        )

    # ------------------------------------------------------------------

    def run(
        self,
        source,
        num_frames: int,
        warmup: int = 1,
        on_frame: Optional[Callable[[int, FrameOutputs], None]] = None,
        fetch_outputs: bool = True,
    ) -> DriverResult:
        if self.frames_per_dispatch > 1:
            return self._run_scan_loop(
                source, num_frames, warmup, on_frame, fetch_outputs
            )
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        # Upload prefetcher: frame fetch + host->device transfer runs on a
        # side thread `pipeline_depth` frames ahead, overlapping transfer
        # latency with device compute (the streaming analog of the C++
        # replayer's page-cache prefetch; the reference blocks on
        # `retrieve_image` every frame instead).
        uploader = ThreadPoolExecutor(max_workers=1)

        def fetch(idx):
            pkt = source.get(idx)
            # capture/replay error propagation: a nonzero per-camera status
            # skips the whole iteration, mirroring the reference's
            # error-code check + `continue` (`2cam/2cams.py:174-176`)
            bad = bool(np.asarray(pkt.status).any())
            return jnp.asarray(pkt.rgb), jnp.asarray(pkt.depth), bad

        ahead = max(self.pipeline_depth, 1)
        in_flight = deque(
            uploader.submit(fetch, j) for j in range(min(ahead, num_frames))
        )
        next_fetch = len(in_flight)

        fps_hist = []
        out = None
        skipped = 0
        pending = deque()
        t_measure = None  # wall-clock start of the post-warmup window
        for i in range(num_frames):
            t0 = time.perf_counter()
            with self.log.span("Frame Retrieval"):
                rgb, depth, bad = in_flight.popleft().result()
                if next_fetch < num_frames:
                    in_flight.append(uploader.submit(fetch, next_fetch))
                    next_fetch += 1
            # NOTE: no "Depth Retrieval" span here — depth arrives fused
            # with the RGB packet above, so the stage has no separate cost;
            # the CSV row is simply absent rather than a misleading zero
            # (the reference times it separately because pyzed retrieves
            # image and measure in two calls, `vision_pipeline_utils.py:218`).
            if bad:
                skipped += 1
                continue

            if self.mode == "fused":
                out = self._run_fused(rgb, depth)
                if fetch_outputs:
                    pending.append((i, out))
                    if len(pending) >= self.pipeline_depth:
                        # COALESCED sync: dispatches execute in launch
                        # order on the single device stream, so readiness
                        # of the NEWEST pending output implies every
                        # earlier one. One block clears the whole queue —
                        # the dev relay charges ~25 ms per synchronous
                        # call, so syncing per frame caps scan=1 at
                        # ~35 FPS no matter how fast the device is
                        # (VERDICT r4 #5); amortizing it over
                        # pipeline_depth frames removes that cap while
                        # keeping per-frame dispatch (a live camera can
                        # feed this loop frame-by-frame, unlike scan>1).
                        # ONE leaf: a dispatched program materializes all
                        # its outputs atomically, and each extra leaf in a
                        # block_until_ready tuple can cost its own relay
                        # round trip
                        jax.block_until_ready(pending[-1][1].workspace.valid)
                        while pending:
                            j, out_j = pending.popleft()
                            if on_frame is not None:
                                on_frame(j, out_j)
            else:
                out = self._run_profiled(rgb, depth)
                if on_frame is not None:
                    on_frame(i, out)

            total = time.perf_counter() - t0
            self.log.end_iteration(total)
            if i >= warmup:
                if t_measure is None:
                    t_measure = t0
                fps_hist.append(1.0 / max(total, 1e-9))
        # drain the pipeline INSIDE the measured window — in-flight frames
        # are not done yet and deep pipelining must not get credit for them
        # (same coalesced sync: block once on the newest, one leaf)
        if pending:
            jax.block_until_ready(pending[-1][1].workspace.valid)
        for j, out_j in pending:
            if on_frame is not None:
                on_frame(j, out_j)
        elapsed = time.perf_counter() - t_measure if t_measure is not None else 0.0
        uploader.shutdown(wait=False)
        self.skipped_frames = skipped
        self.log.write_timings()
        # mean_fps is wall-clock throughput (frames / elapsed): an arithmetic
        # mean of per-frame 1/dt would overweight the cheap dispatch-only
        # iterations that pipelined execution produces in bursts.
        measured = len(fps_hist)
        fps_arr = np.asarray(fps_hist) if fps_hist else np.asarray([0.0])
        return DriverResult(
            frames=num_frames,
            mean_fps=float(measured / elapsed) if elapsed > 0 else 0.0,
            median_fps=float(np.median(fps_arr)),
            max_fps=float(fps_arr.max()),
            summary_ms=self.log.summary_ms(),
            last_outputs=out,
            skipped_frames=skipped,
        )

    # ------------------------------------------------------------------

    def _run_scan_loop(
        self,
        source,
        num_frames: int,
        warmup: int,
        on_frame: Optional[Callable[[int, FrameOutputs], None]],
        fetch_outputs: bool,
    ) -> DriverResult:
        """Throughput-mode loop: K frames per jitted dispatch
        (`Pipeline.step_scan`), chunks pipelined `pipeline_depth` deep."""
        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        k = self.frames_per_dispatch
        uploader = ThreadPoolExecutor(max_workers=1)
        # the `good` device operand repeats a handful of patterns (usually
        # all-True); caching it avoids a per-chunk host->device transfer
        get_chunk = getattr(source, "get_chunk", None)
        good_cache: Dict[bytes, jax.Array] = {}

        def _good_dev(good_np):
            key = good_np.tobytes()
            g = good_cache.get(key)
            if g is None:
                g = good_cache[key] = jnp.asarray(good_np)
            return g

        def fetch_chunk(start):
            if get_chunk is not None:
                # chunked-replay fast path: the source serves pre-stacked
                # (k, ...) chunk tensors (e.g. staged replay buffers),
                # skipping the per-chunk stack dispatches — measured
                # 2.4-8 ms/chunk on the dev relay. Padding past the run
                # end is masked here, same as the per-frame path below.
                rgb, depth, goods = get_chunk(start, k)
                good_np = np.asarray(goods, bool).copy()
                good_np[max(num_frames - start, 0):] = False
                return jnp.asarray(rgb), jnp.asarray(depth), \
                    _good_dev(good_np), good_np
            rgbs, depths, goods = [], [], []
            for j in range(start, min(start + k, num_frames)):
                pkt = source.get(j)
                rgbs.append(pkt.rgb)
                depths.append(pkt.depth)
                goods.append(not bool(np.asarray(pkt.status).any()))
            while len(rgbs) < k:  # short tail: pad, padding never counts
                rgbs.append(rgbs[-1])
                depths.append(depths[-1])
                goods.append(False)
            # goods returned BOTH as the device operand and as a host array:
            # reading the device copy back (np.asarray) would be a
            # synchronous ~25 ms relay round trip per chunk
            good_np = np.asarray(goods, bool)
            return (
                jnp.stack([jnp.asarray(r) for r in rgbs]),
                jnp.stack([jnp.asarray(d) for d in depths]),
                _good_dev(good_np),
                good_np,
            )

        starts = list(range(0, num_frames, k))
        ahead = max(self.pipeline_depth, 1)
        in_flight = deque(
            uploader.submit(fetch_chunk, s) for s in starts[:ahead]
        )
        next_chunk = len(in_flight)

        out = None
        last_good = [None]  # last GOOD frame's outputs (matches frame loop)
        skipped = 0
        pending = deque()
        t_measure = None
        measured = 0
        per_frame_times: list = []

        def drain_one():
            # `good` masks bad-status frames and tail padding alike: only
            # good frames reach on_frame / last_outputs, mirroring the
            # frame-at-a-time loop's `if bad: continue`
            s0, out_j, good_np, n_real = pending.popleft()
            # one leaf: program outputs materialize atomically, extra
            # leaves can cost extra synchronous relay round trips
            jax.block_until_ready(out_j.workspace.valid)
            picked = None
            for j in range(n_real):
                if not good_np[j]:
                    continue
                if on_frame is not None:
                    on_frame(
                        s0 + j,
                        jax.tree_util.tree_map(lambda x, _j=j: x[_j], out_j),
                    )
                picked = j
            if picked is not None:
                # defer the tree slice to the end of the run: ~20 tiny
                # slice dispatches per chunk are pure relay overhead
                last_good[0] = (out_j, picked)
            return out_j

        for ci, s in enumerate(starts):
            t0 = time.perf_counter()
            rgb, depth, good, good_host = in_flight.popleft().result()
            ngood = int(good_host.sum())
            if next_chunk < len(starts):
                in_flight.append(
                    uploader.submit(fetch_chunk, starts[next_chunk])
                )
                next_chunk += 1
            t_retr = time.perf_counter() - t0
            n_real = min(k, num_frames - s)
            skipped += n_real - ngood
            if ngood == 0:
                # whole chunk is error-status/padding: every state update
                # would be masked out and no output is ever read — skip the
                # device step entirely (frame loop's `continue` analog)
                continue
            self.state, out_k = self._step_scan(
                self.params, self.state, rgb, depth, self.calib, good
            )
            if fetch_outputs:
                pending.append((s, out_k, good_host, n_real))
                if len(pending) >= self.pipeline_depth:
                    out = drain_one()
            else:
                # mirror the frame-at-a-time loop, which still returns the
                # last un-synced outputs when nobody consumes per-frame
                # results (slice deferred to the end of the run, as above)
                for j in range(n_real):
                    if good_host[j]:
                        last_good[0] = (out_k, j)
            total = time.perf_counter() - t0
            # one CSV row per GOOD frame for every stage, so columns stay
            # frame-aligned with the frame-at-a-time loop and the
            # reference's schema. Chunk cost is split over the n_real
            # frames the scan EXECUTED, not just the good ones — a
            # 1-good/3-bad chunk runs 4 device steps, and charging all 4
            # to the single good frame would inflate its number (the
            # frame-loop analog skips bad frames before the device step,
            # so its good-frame rows carry no such surcharge either).
            # Bad frames' share of the chunk is intentionally unlogged.
            for _ in range(ngood):
                self.log.add("Frame Retrieval", t_retr / max(n_real, 1))
                self.log.end_iteration(total / max(n_real, 1))
            if s >= warmup:
                if t_measure is None:
                    t_measure = t0
                measured += ngood
                if ngood:
                    per_frame_times.extend([total / n_real] * ngood)
        while pending:
            out = drain_one()
        elapsed = (
            time.perf_counter() - t_measure if t_measure is not None else 0.0
        )
        uploader.shutdown(wait=False)
        self.skipped_frames = skipped
        self.log.write_timings()
        per_frame = np.asarray(per_frame_times)
        del out  # drained; last_good holds the last good frame's outputs
        last_outputs = None
        if last_good[0] is not None:
            out_j, picked = last_good[0]
            last_outputs = jax.tree_util.tree_map(
                lambda x, _j=picked: x[_j], out_j
            )
        return DriverResult(
            frames=num_frames,
            mean_fps=float(measured / elapsed) if elapsed > 0 else 0.0,
            median_fps=float(1.0 / np.median(per_frame)) if len(per_frame) else 0.0,
            max_fps=float(1.0 / per_frame.min()) if len(per_frame) else 0.0,
            summary_ms=self.log.summary_ms(),
            last_outputs=last_outputs,
            skipped_frames=skipped,
        )
