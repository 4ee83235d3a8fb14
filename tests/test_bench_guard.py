"""Smoke tests for bench.py's bounded device-wait guard.

The guard exists because axon backend init HANGS (rather than erroring)
while the dev-tunnel relay is down — an unguarded end-of-round bench run
would stall at the first `jax.devices()` and record nothing. These tests
run on CPU, where backend init succeeds instantly, and only exercise the
probe loop's control flow (success path + deadline bounding)."""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def test_wait_for_device_succeeds_on_healthy_backend():
    # CPU jax init succeeds -> first probe returns True well inside budget
    assert bench._wait_for_device(120) is True


def test_build_bench_config_defaults_match_reference():
    # the end-of-round driver run uses an empty env: it must resolve to
    # the reference's published-numbers config exactly
    from rt3d.config import reference_2cam_config

    cfg, info = bench.build_bench_config(env={})
    assert cfg == reference_2cam_config()
    assert info == {"preset": "gpu", "variant": "x",
                    "tracker": "bytetrack", "cams": 2, "voxel_mm": 5.0}


def test_build_bench_config_cpu_preset_keeps_its_voxel():
    # BASELINE.json configs[0]: 1 cm voxel + erode + workspace SOR +
    # yolo11n; the VOXEL_MM default must come from the preset, not
    # clobber it back to 5 mm
    cfg, info = bench.build_bench_config(env={"RT3D_BENCH_PRESET": "cpu"})
    assert cfg.pipeline.voxel_size == 0.01
    assert cfg.pipeline.erode_kernel == 12 and cfg.pipeline.workspace_sor
    assert info["variant"] == "n" and info["voxel_mm"] == 10.0


def test_build_bench_config_1cam_preset_single_camera():
    cfg, info = bench.build_bench_config(env={"RT3D_BENCH_PRESET": "1cam"})
    assert info["cams"] == 1 and info["variant"] == "l"


def test_build_bench_config_stretch_grows_capacities():
    cfg, info = bench.build_bench_config(env={
        "RT3D_BENCH_CAMS": "4", "RT3D_BENCH_VOXEL_MM": "1",
        "RT3D_BENCH_ACCUM": "1",
    })
    assert cfg.pipeline.voxel_size == 0.001
    assert cfg.pipeline.max_points_workspace == 262144
    assert cfg.pipeline.max_points_workspace_fused == 262144 * 4
    assert cfg.pipeline.workspace_accumulate
    assert cfg.pipeline.accum_skip_prededupe
    assert cfg.pipeline.accum_capacity == 262144 * 4


def test_build_bench_config_tracker_knob():
    cfg, info = bench.build_bench_config(
        env={"RT3D_BENCH_TRACKER": "botsort"})
    assert cfg.tracker.tracker_type == "botsort"
    assert cfg.tracker.with_reid and cfg.tracker.gmc
    cfg, info = bench.build_bench_config(
        env={"RT3D_BENCH_TRACKER": "deepsort"})
    assert cfg.tracker.tracker_type == "deepsort"
    assert cfg.tracker.with_reid and not cfg.tracker.gmc
    assert info["tracker"] == "deepsort"


def test_build_bench_config_bf16_knobs():
    # bf16 resizes are the preset DEFAULT (chip accuracy gate, config.py)
    cfg, _ = bench.build_bench_config(env={})
    assert cfg.model.mask_resize_dtype == "bfloat16"
    assert cfg.model.preprocess_dtype == "bfloat16"
    # the knobs are two-way A/B overrides: "0" forces f32, "1" forces bf16
    cfg, _ = bench.build_bench_config(env={
        "RT3D_BENCH_MASK_BF16": "0", "RT3D_BENCH_PREPROC_BF16": "0"})
    assert cfg.model.mask_resize_dtype == "float32"
    assert cfg.model.preprocess_dtype == "float32"
    cfg, _ = bench.build_bench_config(env={
        "RT3D_BENCH_MASK_BF16": "1", "RT3D_BENCH_PREPROC_BF16": "1"})
    assert cfg.model.mask_resize_dtype == "bfloat16"
    assert cfg.model.preprocess_dtype == "bfloat16"


def test_suite_rows_self_qualify():
    """Every suite row must carry its own device_step_ms + fps_windows.

    VERDICT r4 weak #4: suite rows ran FAST (headline FPS only), so the
    stretch-config SOR regression was indistinguishable from relay-phase
    noise until a same-day re-measure. The device-time profile block must
    therefore execute unconditionally (before the `not fast` gate), and
    fps_windows is recorded at result-build time for every mode. Source-
    structure check: cheap, and it fails loudly if someone re-gates it."""
    import inspect

    src = inspect.getsource(bench.main)
    i_step = src.index('result["device_step_ms"]')
    i_gate = src.index("if not fast:")
    assert i_step < i_gate, (
        "device_step_ms measurement moved behind the fast gate — suite "
        "rows would lose their self-qualifying device time")
    assert '"fps_windows"' in src.split("if not fast:")[0]


def test_wait_for_device_deadline_is_bounded(monkeypatch):
    # a probe that always hangs must not overrun the budget by more than
    # one probe floor (10 s)
    def hang(*a, **kw):
        raise subprocess.TimeoutExpired(cmd="probe", timeout=kw["timeout"])

    # bench imports subprocess inside the function; patching the module
    # global reaches the same object
    monkeypatch.setattr(subprocess, "run", hang)
    t0 = time.time()
    assert bench._wait_for_device(3) is False
    assert time.time() - t0 < 15
