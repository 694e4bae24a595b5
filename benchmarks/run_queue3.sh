#!/bin/bash
# Confirmation + policy-validation round (DESIGN.md §29b):
#  - tiny MXU_T repeat pair (default flip needs > session noise)
#  - base/small under the shipped auto policy (base wq+cq unmeasured;
#    small should land ~1,908 wq-only after the d=768 cq carve-out)
#  - tiny b8/b1 rows for the README table under the new defaults
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
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_TPU_MXU_T=8
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_TPU_MXU_T=8
run WHISPER_BENCH_MODEL=base WHISPER_BENCH_BATCH=32
run WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=8
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=1
