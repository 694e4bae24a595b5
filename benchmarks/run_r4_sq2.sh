#!/bin/bash
# r4 campaign E follow-up — DESIGN §35: sq A/B at the two widths the
# first queue skipped (base d=512, small d=768), to make every policy
# cell measured rather than interpolated. Waits for the first queue
# (PID file /tmp/r4sq.pid) to exit before touching the chip.
set -u
LOGDIR=${LOGDIR:-/tmp/r4sq}
mkdir -p "$LOGDIR"
if [[ -f /tmp/r4sq.pid ]]; then
  prev=$(cat /tmp/r4sq.pid)
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run base_b32_base  env WHISPER_BENCH_MODEL=base  WHISPER_BENCH_BATCH=32 WHISPER_BENCH_SQ=0 python bench.py
run base_b32_sq    env WHISPER_BENCH_MODEL=base  WHISPER_BENCH_BATCH=32 WHISPER_BENCH_SQ=1 python bench.py
run small_b16_base env WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=0 python bench.py
run small_b16_sq   env WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=1 python bench.py
echo "ALL DONE2 $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
