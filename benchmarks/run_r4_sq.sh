#!/bin/bash
# r4 campaign E — DESIGN §35: scale-commuted int8 SELF cache (sq) e2e
# A/B at the shipped serving defaults. Paired legs (baseline then sq)
# per model in one session for variance control. The modeled bound:
# sq saves ~5% of decode-step bytes at the bench's 128-slot cache
# (self share 10-12%, halved), ~3x that at the engine's 448-slot caps.
set -u
LOGDIR=${LOGDIR:-/tmp/r4sq}
mkdir -p "$LOGDIR"
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run tiny_b32_base   env WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_BENCH_SQ=0 python bench.py
run tiny_b32_sq     env WHISPER_BENCH_MODEL=tiny WHISPER_BENCH_BATCH=32 WHISPER_BENCH_SQ=1 python bench.py
run medium_b16_base env WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=0 python bench.py
run medium_b16_sq   env WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=1 python bench.py
run large_b16_base  env WHISPER_BENCH_MODEL=large-v2 WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=0 python bench.py
run large_b16_sq    env WHISPER_BENCH_MODEL=large-v2 WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=1 python bench.py
run turbo_b32_base  env WHISPER_BENCH_MODEL=large-v3-turbo WHISPER_BENCH_BATCH=32 WHISPER_BENCH_SQ=0 python bench.py
run turbo_b32_sq    env WHISPER_BENCH_MODEL=large-v3-turbo WHISPER_BENCH_BATCH=32 WHISPER_BENCH_SQ=1 python bench.py
echo "ALL DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
