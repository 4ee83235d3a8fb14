#!/bin/bash
# Serial on-chip measurement checklist — the round-3 work that landed
# during the 2026-08-17/18 relay outage, in priority order. Run from the
# repo root the moment the TPU tunnel answers. ONE jax process at a time
# (1 host CPU core + relay contention corrupt timings); every step is
# timeout-bounded so a relay flap can't wedge the run.
#
#   bash tools/chip_checklist.sh [logdir]
#
# Results land in <logdir>/NN_<name>.log plus a one-line summary each in
# <logdir>/summary.txt. Steps that produce a JSON record have it as the
# last line of their log.
set -u
LOG=${1:-runs_chip_$(date -u +%Y%m%dT%H%M)}
mkdir -p "$LOG"
export JAX_COMPILATION_CACHE_DIR=${JAX_COMPILATION_CACHE_DIR:-/tmp/rt3d_jax_cache_tpu}
# APPEND to PYTHONPATH: the shell presets /root/.axon_site, which registers
# the TPU plugin — replacing it kills the axon backend (learned twice now)
export PYTHONPATH=.${PYTHONPATH:+:$PYTHONPATH}
SUMMARY="$LOG/summary.txt"
touch "$SUMMARY"

run_step() {  # run_step NN name timeout_s cmd...
  local nn=$1 name=$2 to=$3; shift 3
  local log="$LOG/${nn}_${name}.log"
  echo "=== [$nn] $name: $* (timeout ${to}s)" | tee -a "$SUMMARY"
  local t0=$SECONDS
  timeout "$to" "$@" >"$log" 2>&1
  local rc=$?
  local dt=$((SECONDS - t0))
  echo "[$nn] $name rc=$rc (${dt}s); last: $(tail -1 "$log" | cut -c1-400)" \
    | tee -a "$SUMMARY"
  return $rc
}

# 1. Drive the real app end-to-end with trained weights (the /verify
#    analog): yolo11n variant, 20 frames, fp then int8.
run_step 01 demo_fp 2400 python tools/demo_pipeline.py
RT3D_DEMO_QUANT=1 run_step 02 demo_int8 2400 python tools/demo_pipeline.py

# 2. int8-x on-chip accuracy (sidecar scales skip calibration). If the
#    compile rejects int8 grouped convs, re-run excluded and record it.
if ! run_step 03 quant_acc_x 3600 \
    python tools/eval_quant_chip.py weights/yolo11x_synth_seg.npz --skip-fp
then
  RT3D_QUANT_NO_GROUPED=1 run_step 03b quant_acc_x_nogrouped 3600 \
    python tools/eval_quant_chip.py weights/yolo11x_synth_seg.npz --skip-fp
  export RT3D_QUANT_NO_GROUPED=1   # propagate to the quant bench below
fi

# 3. fp headline bench (fresh compiles of the NMS-rounds + sort work;
#    expect >= 121.7 FPS). FAST=0: all secondary modes for the
#    self-qualifying record.
run_step 04 bench_fp 5400 python bench.py
grep '^{' "$LOG/04_bench_fp.log" | tail -1 > "$LOG/BENCH_fp.json" || true

# 4. int8 bench (expect ~135-150 if int8 conv MFU holds).
RT3D_BENCH_QUANT=1 run_step 05 bench_int8 5400 python bench.py
grep '^{' "$LOG/05_bench_int8.log" | tail -1 > "$LOG/BENCH_int8.json" || true

# 5. Stretch: 4-cam @ 1 mm + accumulation, n-variant, fast mode
#    (expect >> 17.7 FPS with accum_skip_prededupe).
RT3D_BENCH_CAMS=4 RT3D_BENCH_VOXEL_MM=1 RT3D_BENCH_ACCUM=1 \
  RT3D_BENCH_VARIANT=n RT3D_BENCH_FAST=1 \
  run_step 06 bench_stretch 5400 python bench.py
grep '^{' "$LOG/06_bench_stretch.log" | tail -1 > "$LOG/BENCH_stretch.json" \
  || true

# --- optional extras (run if tunnel time allows) -------------------------
# (the percentile act-scale A/B was removed 2026-08-18: measured on CPU
#  with the n artifact, p99.9 scales cost recall 0.95->0.70 / IoU
#  0.873->0.637 vs the max envelope — scale choice is backend-independent,
#  so there is nothing left to measure on chip; see NOTES.md)
if [ "${RT3D_CHECKLIST_EXTRAS:-}" = "1" ]; then
  # 6. scan depth re-probe post layout fix (NOTES lever 3)
  RT3D_BENCH_SCAN=8 RT3D_BENCH_FAST=1 \
    run_step 07 bench_scan8 5400 python bench.py
  # 7. int8 step attribution for the NOTES table
  RT3D_TRACE_TRAINED=1 RT3D_TRACE_QUANT=1 RT3D_DEMO_VARIANT=x \
    run_step 08 trace_int8 3600 python tools/trace_fused.py
  # 8. bf16 resize A/B: retina-mask upsample + letterbox preprocess (fast
  #    mode; flip the config defaults if they win and the band tests hold)
  RT3D_BENCH_MASK_BF16=1 RT3D_BENCH_FAST=1 \
    run_step 09 bench_mask_bf16 5400 python bench.py
  RT3D_BENCH_MASK_BF16=1 RT3D_BENCH_PREPROC_BF16=1 RT3D_BENCH_FAST=1 \
    run_step 10 bench_resize_bf16 5400 python bench.py
  # 9. BASELINE configs[0] parity row: the 2cams_mask_cpu.py variant
  #    (1 cm voxel, erode 12x12, workspace SOR, yolo11n)
  RT3D_BENCH_PRESET=cpu RT3D_BENCH_FAST=1 \
    run_step 11 bench_cpu_preset 5400 python bench.py
  # 10. BASELINE configs[1]: the 1cam/rt-tracking.py preset
  RT3D_BENCH_PRESET=1cam RT3D_BENCH_FAST=1 \
    run_step 12 bench_1cam_preset 5400 python bench.py
  # 11. BASELINE configs[3]: appearance-embedding tracking (BoT-SORT ReID
  #     + affine GMC) — re-measure post sort-operand sweep + greedy rounds
  RT3D_BENCH_TRACKER=botsort RT3D_BENCH_FAST=1 \
    run_step 13 bench_botsort 5400 python bench.py
fi

echo "=== checklist done; summary:" | tee -a "$SUMMARY"
cat "$SUMMARY"
