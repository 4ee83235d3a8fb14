#!/bin/bash
# Round-5 serial chip session: verify E2E, headline bench (with the
# coalesced-sync latency mode), persistent-loop streaming measurement,
# and tracker-tax traces. One step at a time — the dev relay tolerates
# exactly one JAX process. Logs land in runs_chip/r5/.
set -x
cd /root/repo
export JAX_COMPILATION_CACHE_DIR=/tmp/rt3d_jax_cache_tpu
export PYTHONPATH=/root/repo:$PYTHONPATH
OUT=runs_chip/r5

case "$1" in
  verify)
    RT3D_DEMO_VARIANT=x timeout 900 python tools/demo_pipeline.py 2>&1 | tail -20
    ;;
  bench)
    timeout 2700 python bench.py 2>&1 | tee $OUT/bench_headline.log | tail -3
    ;;
  ploop)
    timeout 1800 python tools/persistent_loop.py --variant "$2" \
      --out $OUT/persistent_loop_"$2".json 2>&1 | tail -8
    ;;
  trace)
    # $2 = tracker (bytetrack|botsort|deepsort)
    env RT3D_TRACE_TRAINED=1 RT3D_DEMO_VARIANT=x \
      $( [ "$2" != bytetrack ] && echo RT3D_TRACE_TRACKER=$2 ) \
      timeout 1500 python tools/trace_fused.py 2>&1 | tee $OUT/trace_x_$2.log | tail -40
    ;;
  suite)
    RT3D_BENCH_SUITE=1 timeout 12000 python bench.py 2>&1 | tail -8
    ;;
esac
