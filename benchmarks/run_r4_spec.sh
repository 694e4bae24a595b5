#!/bin/bash
# r4 campaign B — DESIGN §33: speculative-decoding envelope on the chip.
# base->large-v2 (the headline pair) k sweep at b1 + one b8 point, and
# turbo->large-v3 (same-tokenizer v3 pair; turbo's 4-layer decoder is the
# cheap-step draft, its encoder is shared-architecture with v3).
set -u
LOGDIR=${LOGDIR:-/tmp/r4spec}
mkdir -p "$LOGDIR"
run() {
  local tag=$1; shift
  echo "=== $tag start $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
  python benchmarks/spec_bench.py "$@" >"$LOGDIR/$tag.out" 2>"$LOGDIR/$tag.err"
  echo "--- $tag exit $? $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
}
run lv2_base_k4_b1 --target large-v2 --draft base --k 4 --batch 1
run lv2_base_k8_b1 --target large-v2 --draft base --k 8 --batch 1
run lv2_base_k2_b1 --target large-v2 --draft base --k 2 --batch 1
run lv2_base_k4_b8 --target large-v2 --draft base --k 4 --batch 8
run lv3_turbo_k4_b1 --target large-v3 --draft turbo --k 4 --batch 1
run lv3_turbo_k8_b1 --target large-v3 --draft turbo --k 8 --batch 1
run lv3_turbo_k4_b8 --target large-v3 --draft turbo --k 4 --batch 8
echo "ALL DONE $(date +%H:%M:%S)" >>"$LOGDIR/queue.log"
