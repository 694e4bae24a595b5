"""Multi-chip sharded inference example.

    python examples/shard.py tiny.npz --dp 2 --tp 4      # 8 chips
    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/shard.py tiny.npz --dp 2 --tp 4  # virtual mesh

Weights are Megatron-sharded over tp, the batch over dp, and (optionally)
the encoder sequence over sp; GSPMD inserts all collectives.
"""

import argparse
import sys

sys.path.insert(0, ".")

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("npz")
    p.add_argument("--model", default="tiny")
    p.add_argument("--dp", type=int, default=1)
    p.add_argument("--tp", type=int, default=1)
    p.add_argument("--sp", type=int, default=1)
    p.add_argument("--batch", type=int, default=8)
    args = p.parse_args()

    from whisper_tpu import ShardedPipeline
    from whisper_tpu.weights import load_npz
    from whisper_tpu.config import get_config

    cfg = get_config(args.model)
    params = load_npz(args.npz, cfg)
    sp = ShardedPipeline(params, cfg, dp=args.dp, tp=args.tp, sp=args.sp)

    rng = np.random.RandomState(0)
    audio = (rng.randn(args.batch, 16_000 * 10) * 0.1).astype(np.float32)
    for row in sp.transcribe_batch(audio):
        print(row["text"][:80])
    return 0


if __name__ == "__main__":
    sys.exit(main())
