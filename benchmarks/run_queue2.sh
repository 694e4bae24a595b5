#!/bin/bash
# Follow-up matrix (run AFTER run_queue.sh drains): why does cq lose at
# small (d=768) while winning at tiny/base/medium/large? Two suspects:
#   (a) chain-G confound — the HBM clamp gave wq+cq G=8 but wq-only G=4,
#       so §29's small rows compare different dispatch amortization;
#   (b) the commuted-scale lowering x MXU-query-tiling interaction
#       (WHISPER_TPU_MXU_T, default 8 from d>=768).
# Also: does MXU_T now pay at tiny under cq, and is it still needed at
# medium under cq?
# NOTE bench.py now defaults WQ/CROSSQUANT to the bf16 serving policy
# (both ON) — decomposition runs must set explicit 0s.
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

# G-controlled small decomposition (wq-only@G4 = 1,908 already measured)
run WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1 WHISPER_BENCH_CHAIN=4
run WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32 WHISPER_BENCH_WQ=1 WHISPER_BENCH_CROSSQUANT=1 WHISPER_BENCH_CHAIN=4 WHISPER_TPU_MXU_T=0
# MXU_T re-check under the new quantized defaults
run WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_TPU_MXU_T=8
run WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=16 WHISPER_TPU_MXU_T=0
# re-run of the failed 'turbo' spelling (bench flags now default to the
# bf16 serving policy = wq+cq)
run WHISPER_BENCH_MODEL=large-v3-turbo WHISPER_BENCH_BATCH=32
