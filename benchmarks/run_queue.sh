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

# Fill in the quantized-default decision matrix (DESIGN.md §29): does wq
# hurt tiny? does cq help base/turbo/large-v3? decompose small's -2%.
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=base WHISPER_BENCH_BATCH=32 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1
run WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=turbo WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
run WHISPER_BENCH_MODEL=large-v3 WHISPER_BENCH_BATCH=8 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1
