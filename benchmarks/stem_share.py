"""Conv-stem share of the encoder wall at the 128-mel larges.

VERDICT r4 weak #7 tail: the §21 im2col negative was measured at tiny
only; at large-v3/turbo the stem's input axis is 1.6x wider (128 mels)
and the rest of the encoder got the §32b int8 stack, so the stem's
SHARE may have grown. The chained-phase harness (benchmarks/phases.py)
cannot answer this at d=1280 — the chained encoder program breaks the
remote compile helper (broken pipe ~27 min in, at chain 32 AND chain
8; r5_queue.out / r5_queue2.out) — so this probe measures single
application programs, the same shape the shipped e2e programs compile
as (§30b: larges run unchained):

  1. wall clock: jit(conv_stem) and jit(encoder_forward), 15 runs each,
     median minus a measured null-dispatch baseline (a trivial jitted
     program's median round-trip, ~30 ms through the axon tunnel);
  2. compiler estimate: sum of estimated_cycles over each compiled
     program (absolute values are ~3x pessimistic but RATIOS between
     programs are meaningful — DESIGN.md §25 methodology note).

Usage: python benchmarks/stem_share.py [--models large-v3,large-v3-turbo]
       [--batch 8] (turbo runs at its serving batch via --batch-turbo 16)
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def med_wall(fn, *args, runs: int = 15) -> float:
    fn(*args).block_until_ready()          # compile
    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn(*args).block_until_ready()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def est_cycles(jfn, *args) -> int:
    txt = jfn.lower(*args).compile().as_text()
    return sum(int(m) for m in re.findall(r'"estimated_cycles":(\d+)', txt))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--models", default="large-v3,large-v3-turbo")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--batch-turbo", type=int, default=16)
    args = p.parse_args()

    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import apply_serving_quant, get_config
    from whisper_tpu.models.whisper import (
        conv_stem, encoder_forward, init_params)
    from whisper_tpu.weights import to_device

    # null-dispatch baseline: the tunnel + runtime cost of any dispatch
    null = jax.jit(lambda x: x + 1.0)
    x0 = jnp.zeros((8, 8), jnp.float32)
    null_s = med_wall(null, x0)

    for model in args.models.split(","):
        B = args.batch_turbo if "turbo" in model else args.batch
        cfg = apply_serving_quant(
            get_config(model).replace(compute_dtype="bfloat16"), batch=B)
        params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                           jnp.bfloat16)
        rng = np.random.RandomState(0)
        audio = jnp.asarray((rng.randn(B, cfg.n_samples) * 0.1)
                            .astype(np.float32))
        mel = jax.jit(lambda a: log_mel_spectrogram(a, cfg))(audio)
        mel.block_until_ready()

        ep = params["encoder"]
        j_stem = jax.jit(lambda m: conv_stem(ep, cfg, m))

        stem_s = med_wall(j_stem, mel) - null_s
        cyc_stem = est_cycles(j_stem, mel)
        print(json.dumps({
            "model": model, "batch": B, "phase": "stem",
            "null_dispatch_ms": round(null_s * 1e3, 2),
            "stem_ms": round(stem_s * 1e3, 3),
            "est_cycles_stem": cyc_stem,
            "quant": {"wq": cfg.weight_quant, "i8k": cfg.encoder_mlp_quant,
                      "i8q": cfg.encoder_qkv_quant},
        }), flush=True)

        if os.environ.get("STEM_ONLY", "0") == "1":
            # the full-encoder compile at d=1280 exceeds the remote
            # helper's ~27-min cap (r5_queue2.out); share denominators
            # come from DESIGN.md §32b's chained-slope encoder walls
            continue
        j_enc = jax.jit(lambda m: encoder_forward(params, cfg, m))
        enc_s = med_wall(j_enc, mel) - null_s
        cyc_enc = est_cycles(j_enc, mel)
        print(json.dumps({
            "model": model, "batch": B, "phase": "encoder",
            "encoder_ms": round(enc_s * 1e3, 3),
            "stem_share_wall_pct": round(100 * stem_s / max(enc_s, 1e-9), 1),
            "stem_share_cycles_pct": round(100 * cyc_stem
                                           / max(cyc_enc, 1), 1),
            "est_cycles_encoder": cyc_enc,
        }), flush=True)


if __name__ == "__main__":
    main()
