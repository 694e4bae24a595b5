#!/bin/bash
# r4 campaign C — DESIGN §34: engine-at-scale + server SSE load evidence.
# Continuous engine beyond tiny (small s16, medium s8) and N concurrent
# SSE clients with mixed short/long-form audio.
set -u
LOGDIR=${LOGDIR:-/tmp/r4engine}
mkdir -p "$LOGDIR"
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run cont_small_s16 env WHISPER_BENCH_MODEL=small CONT_SLOTS=16 CONT_REQUESTS=64 CONT_MAX_NEW=48 CONT_SYNC_EVERY=8 python benchmarks/continuous_bench.py
run cont_medium_s8 env WHISPER_BENCH_MODEL=medium CONT_SLOTS=8 CONT_REQUESTS=32 CONT_MAX_NEW=48 CONT_SYNC_EVERY=8 python benchmarks/continuous_bench.py
run cont_small_s16_sync1 env WHISPER_BENCH_MODEL=small CONT_SLOTS=16 CONT_REQUESTS=64 CONT_MAX_NEW=48 CONT_SYNC_EVERY=1 python benchmarks/continuous_bench.py
run load_tiny_c8 python benchmarks/server_load.py --model tiny --clients 8 --slots 8
run load_small_c8 python benchmarks/server_load.py --model small --clients 8 --slots 8
run load_tiny_c16 python benchmarks/server_load.py --model tiny --clients 16 --slots 8
echo "ALL DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
