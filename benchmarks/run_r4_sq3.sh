#!/bin/bash
# r4 campaign E part 3 — DESIGN §35 addendum: engine-level sq A/B.
# The continuous engine allocates self caches at the n_text_ctx cap
# (448 slots vs bench.py's right-sized ~128), so the self-cache read is
# ~25% of step bytes there — the modeled sq win is ~3x the offline one.
# Paired legs at medium s8 (the widest engine config measured in §34).
set -u
LOGDIR=${LOGDIR:-/tmp/r4sq}
mkdir -p "$LOGDIR"
if [[ -f /tmp/r4sq2.pid ]]; then
  prev=$(cat /tmp/r4sq2.pid)
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run cont_med_s8_base env WHISPER_BENCH_MODEL=medium CONT_SLOTS=8 \
    CONT_REQUESTS=32 CONT_SQ=0 python benchmarks/continuous_bench.py
run cont_med_s8_sq   env WHISPER_BENCH_MODEL=medium CONT_SLOTS=8 \
    CONT_REQUESTS=32 CONT_SQ=1 python benchmarks/continuous_bench.py
run cont_small_s16_base env WHISPER_BENCH_MODEL=small CONT_SLOTS=16 \
    CONT_REQUESTS=64 CONT_SQ=0 python benchmarks/continuous_bench.py
run cont_small_s16_sq   env WHISPER_BENCH_MODEL=small CONT_SLOTS=16 \
    CONT_REQUESTS=64 CONT_SQ=1 python benchmarks/continuous_bench.py
echo "ALL DONE3 $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
