#!/bin/bash
# Round-5 on-chip evidence queue (VERDICT r4 items 2/3/5/6/7), priority
# order: the items most likely to change a shipped default come first so
# a wall-clock cutoff still leaves the critical evidence on disk.
# Run on a QUIET host (no concurrent CPU suite): nohup bash benchmarks/run_r5_queue.sh &
set -x
cd "$(dirname "$0")/.."
OUT=benchmarks/r5_queue.out
: > $OUT
log() { echo "=== $* ===" >> $OUT; }

# 1) headline refresh + warm compile cache
log bench headline
timeout 3600 python bench.py >> $OUT 2>&1

# 2) beam at the r4 serving defaults (VERDICT weak #2): the shipped
#    policy now turns sq on at medium/large — beam has never executed
#    under it on hardware. medium/large first (the changed cells).
log beam5 medium b8 serving-defaults
timeout 5400 python benchmarks/beam_bench.py --model medium --batch 8 \
  --beam 5 --serving-defaults >> $OUT 2>&1
log beam5 large-v2 b8 serving-defaults
timeout 5400 python benchmarks/beam_bench.py --model large-v2 --batch 8 \
  --beam 5 --serving-defaults >> $OUT 2>&1

# 3a) engine refresh at today's defaults (VERDICT weak #3): medium s8
#     gained o-proj + QKV hybrid + sq since ffb01c7's 262 tok/s
log continuous medium s8
timeout 5400 env WHISPER_BENCH_MODEL=medium CONT_SLOTS=8 CONT_REQUESTS=32 \
  python benchmarks/continuous_bench.py >> $OUT 2>&1

# 3b) single-file long-form headline (VERDICT weak #7)
log longform tiny 10min f1
timeout 3600 env LF_MODEL=tiny LF_MINUTES=10 python benchmarks/longform_bench.py >> $OUT 2>&1
log longform tiny 10min f8
timeout 3600 env LF_MODEL=tiny LF_MINUTES=10 LF_FILES=8 python benchmarks/longform_bench.py >> $OUT 2>&1
log longform medium 10min f1
timeout 5400 env LF_MODEL=medium LF_MINUTES=10 python benchmarks/longform_bench.py >> $OUT 2>&1

# 2b) remaining beam legs (small/base/tiny at today's defaults)
for m in small base tiny; do
  log beam5 $m b8 serving-defaults
  timeout 3600 python benchmarks/beam_bench.py --model $m --batch 8 \
    --beam 5 --serving-defaults >> $OUT 2>&1
done

# 3c) small s16 engine control
log continuous small s16 control
timeout 3600 env WHISPER_BENCH_MODEL=small CONT_SLOTS=16 CONT_REQUESTS=64 \
  python benchmarks/continuous_bench.py >> $OUT 2>&1

# 7) conv-stem share at the 128-mel larges (VERDICT weak #7 tail)
log phases large-v3 enc b8 serving-defaults
timeout 5400 python benchmarks/phases.py --model large-v3 --batch 8 \
  --serving-defaults --phases mel,encoder,enc_conv >> $OUT 2>&1
log phases turbo enc b16 serving-defaults
timeout 5400 python benchmarks/phases.py --model large-v3-turbo --batch 16 \
  --serving-defaults --phases mel,encoder,enc_conv >> $OUT 2>&1

# 5) decompose the d=768 cq carve-out (VERDICT weak #5)
log cq768 probe
timeout 5400 python benchmarks/cq768_probe.py >> $OUT 2>&1

# 6) quant divergence at the widths that actually ship the features
#    (VERDICT weak #4): small (i8k), medium (i8k+i8q+sq) — on-chip so
#    the Pallas tails run natively; random weights, labeled artifacts
log wer small on-chip
timeout 5400 env WHISPER_WER_PLATFORM=axon python benchmarks/wer.py \
  --model small --clips 4 --max-new 32 \
  --variants bf16_greedy,bf16_serving >> $OUT 2>&1
log wer medium on-chip
timeout 5400 env WHISPER_WER_PLATFORM=axon python benchmarks/wer.py \
  --model medium --clips 4 --max-new 32 \
  --variants bf16_greedy,bf16_serving >> $OUT 2>&1

log DONE
