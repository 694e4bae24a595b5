#!/bin/bash
# Round-5 follow-up queue: items the first queue could not complete or
# that its results motivated.
#  - phases at the larges with SHORT chains: the 32-long chained encoder
#    program at d=1280 kills the remote compile helper (broken pipe ~30
#    min in); iters=8 (chain 8 vs 2) keeps the program tractable and the
#    6x encoder span still dwarfs dispatch jitter.
#  - tiny beam at the regated defaults (effective rows = batch x beam).
#  - medium engine CONT_SQ A/B (253.1 tok/s at sq-on vs the stale 262
#    pre-sq number needs a same-session pair).
#  - cq768 HLO decomposition leg.
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/r5_queue2.out
: > $OUT
log() { echo "=== $* ===" >> $OUT; }

log phases large-v3 b8 iters8
timeout 5400 python benchmarks/phases.py --model large-v3 --batch 8 \
  --iters 8 --serving-defaults --phases mel,encoder,enc_conv >> $OUT 2>&1
log phases turbo b16 iters8
timeout 5400 python benchmarks/phases.py --model large-v3-turbo --batch 16 \
  --iters 8 --serving-defaults --phases mel,encoder,enc_conv >> $OUT 2>&1

log beam5 tiny b8 regated
timeout 3600 python benchmarks/beam_bench.py --model tiny --batch 8 \
  --beam 5 --serving-defaults >> $OUT 2>&1

log continuous medium s8 sq-off
timeout 5400 env WHISPER_BENCH_MODEL=medium CONT_SLOTS=8 CONT_REQUESTS=32 \
  CONT_SQ=0 python benchmarks/continuous_bench.py >> $OUT 2>&1
log continuous medium s8 sq-on repeat
timeout 5400 env WHISPER_BENCH_MODEL=medium CONT_SLOTS=8 CONT_REQUESTS=32 \
  python benchmarks/continuous_bench.py >> $OUT 2>&1

log cq768 hlo
timeout 5400 python benchmarks/cq768_probe.py --hlo \
  --models base,small,medium >> $OUT 2>&1

log DONE
