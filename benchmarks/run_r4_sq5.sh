#!/bin/bash
# r4 campaign E part 5 — DESIGN §35: large-v3 sq confirmation pair.
# v3 shares large-v2's compute dims (d=1280, 32 dec layers); the deltas
# are vocab 51,866 and the 128-mel stem — both outside the decode loop —
# but §32b's precedent is to confirm v3 explicitly rather than cite v2.
set -u
LOGDIR=${LOGDIR:-/tmp/r4sq}
mkdir -p "$LOGDIR"
if [[ -f /tmp/r4sq4.pid ]]; then
  prev=$(cat /tmp/r4sq4.pid)
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run v3_b16_base env WHISPER_BENCH_MODEL=large-v3 WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=0 python bench.py
run v3_b16_sq   env WHISPER_BENCH_MODEL=large-v3 WHISPER_BENCH_BATCH=16 WHISPER_BENCH_SQ=1 python bench.py
echo "ALL DONE5 $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
