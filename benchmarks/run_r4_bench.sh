#!/bin/bash
# r4 campaign D — e2e family confirmations at the NEW serving defaults
# (§32b in-kernel int8 encoder MLP at d>=768), plus tiny/base-width
# encoder A/Bs to complete the §32b width table.
set -u
LOGDIR=${LOGDIR:-/tmp/r4bench}
mkdir -p "$LOGDIR"
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
AB='ENC_AB_ONLY=bf16(shipped),int8-tail'
run ab_tiny env "$AB" python benchmarks/enc_i8_ab.py --e2e --model tiny --batch 32
run ab_base env "$AB" python benchmarks/enc_i8_ab.py --e2e --model base --batch 32
run bench_small env WHISPER_BENCH_MODEL=small WHISPER_BENCH_BATCH=32 python bench.py
run bench_medium env WHISPER_BENCH_MODEL=medium WHISPER_BENCH_BATCH=16 python bench.py
run bench_large env WHISPER_BENCH_MODEL=large-v2 WHISPER_BENCH_BATCH=16 python bench.py
run bench_turbo env WHISPER_BENCH_MODEL=large-v3-turbo WHISPER_BENCH_BATCH=32 python bench.py
echo "ALL DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
