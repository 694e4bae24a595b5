#!/bin/bash
# base (d=512) decomposition: auto (wq+cq+MXU8) measured 6,873 vs the
# earlier cq-only@MXU0 7,294 — find which ingredient hurts at 512.
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
run WHISPER_BENCH_MODEL=base WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1 WHISPER_TPU_MXU_T=0
run WHISPER_BENCH_MODEL=base WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=0 WHISPER_BENCH_CROSSQUANT=1 WHISPER_TPU_MXU_T=0
run WHISPER_BENCH_MODEL=base WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=0
# low-batch: quant defaults measured NEGATIVE at b8/b1 (6,049 vs 6,560;
# b1 p50 50.4 vs 44.8 ms) — is it the tiling, the quant, or both?
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=8 WHISPER_TPU_MXU_T=0
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=8 WHISPER_BENCH_WQ=0 WHISPER_BENCH_CROSSQUANT=0
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=1 WHISPER_TPU_MXU_T=0
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=1 WHISPER_BENCH_WQ=0 WHISPER_BENCH_CROSSQUANT=0
