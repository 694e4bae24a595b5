#!/bin/bash
# Sequential on-chip bench queue — one config at a time (the chip and the
# remote AOT compiler serialize anyway). Each run appends its ONE JSON
# result line to $OUT; stderr goes to a per-run log under /tmp/benchlogs
# (a silent empty append means the run CRASHED — read its log).
# Usage: nohup bash benchmarks/run_queue.sh > /tmp/queue.log 2>&1 &
set -u
OUT=${OUT:-/tmp/bench_queue_results.jsonl}
LOGDIR=${LOGDIR:-/tmp/benchlogs}
mkdir -p "$LOGDIR"

run() {
  local tag
  tag=$(echo "$*" | tr ' =' '__')
  echo "=== $* $(date +%H:%M:%S)" >&2
  env "$@" python bench.py 2>"$LOGDIR/$tag.err" | tail -1 | tee -a "$OUT"
  echo "--- exit ${PIPESTATUS[0]} $(date +%H:%M:%S)" >&2
}

# commuted int8 cross A/B (DESIGN.md §16 update) + stacking with wq
run WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=16 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=large-v2 WHISPER_BENCH_BATCH=8 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=16 WHISPER_BENCH_WQ=1
run WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
