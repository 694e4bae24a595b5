#!/bin/bash
# r4 campaign A2 — DESIGN §32b: int8 MLP inside the fused tail, e2e
# encoder walls vs the shipped bf16 tail (fresh paired bf16 legs for
# session-variance control), then campaign C (engine at scale).
set -u
LOGDIR=${LOGDIR:-/tmp/r4i8k}
mkdir -p "$LOGDIR"
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
AB='ENC_AB_ONLY=bf16(shipped),int8-tail'
run i8k_medium env "$AB" python benchmarks/enc_i8_ab.py --e2e --model medium --batch 16
run i8k_large env "$AB" python benchmarks/enc_i8_ab.py --e2e --model large-v2 --batch 16 --n1 16 --n2 64
run i8k_turbo env "$AB" python benchmarks/enc_i8_ab.py --e2e --model turbo --batch 32 --n1 16 --n2 64
run i8k_small env "$AB" python benchmarks/enc_i8_ab.py --e2e --model small --batch 32
echo "A2 DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
bash benchmarks/run_r4_engine.sh
echo "ALL DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
