#!/bin/bash
# r4 campaign E part 4 — DESIGN §35: does sq need a batch gate?
# large-v2 b1 (latency mode) pair: at b1 the self-cache read is the
# smallest share of step bytes (weight reads dominate) and the
# per-step row quantize amortizes worst, so b1 is where sq would go
# negative first at the widths where it wins batched.
set -u
LOGDIR=${LOGDIR:-/tmp/r4sq}
mkdir -p "$LOGDIR"
if [[ -f /tmp/r4sq3.pid ]]; then
  prev=$(cat /tmp/r4sq3.pid)
  while kill -0 "$prev" 2>/dev/null; do sleep 20; done
fi
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run large_b1_base env WHISPER_BENCH_MODEL=large-v2 WHISPER_BENCH_BATCH=1 WHISPER_BENCH_SQ=0 python bench.py
run large_b1_sq   env WHISPER_BENCH_MODEL=large-v2 WHISPER_BENCH_BATCH=1 WHISPER_BENCH_SQ=1 python bench.py
echo "ALL DONE4 $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
