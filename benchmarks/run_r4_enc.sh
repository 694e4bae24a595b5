#!/bin/bash
# r4 campaign A — DESIGN §32: encoder int8 MXU projections, e2e encoder
# walls (shipped bf16 fused-tail path vs WHISPER_TPU_ENC_I8=1) across the
# compute-bound family members, plus a d=1280 micro point.
set -u
LOGDIR=${LOGDIR:-/tmp/r4enc}
mkdir -p "$LOGDIR"
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  python "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run micro1280 benchmarks/enc_i8_ab.py --micro --d 1280
run e2e_small benchmarks/enc_i8_ab.py --e2e --model small --batch 32
run e2e_medium benchmarks/enc_i8_ab.py --e2e --model medium --batch 16
run e2e_large benchmarks/enc_i8_ab.py --e2e --model large-v2 --batch 16
run e2e_turbo benchmarks/enc_i8_ab.py --e2e --model turbo --batch 32
echo "ALL DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
