"""Batch/dtype sweep of the TPU engine — one JSON line per configuration.

Usage:
    python benchmarks/sweep.py --batches 1,8,32 --dtypes float32,bfloat16
        [--model tiny] [--gen-tokens 89]

Each configuration compiles once (persistent compilation cache enabled) and
reports RTFx + p50. This is the expanded version of bench.py's single
headline line, for tuning work.
"""

from __future__ import annotations

import argparse
import json
import os
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


def bench_one(model: str, batch: int, dtype: str, gen_tokens: int,
              repeats: int = 5) -> dict:
    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import greedy_decode
    from whisper_tpu.models.whisper import encoder_forward, init_params
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    cfg = get_config(model).replace(compute_dtype=dtype)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        params = to_device(params, jnp.bfloat16)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (batch, 1)), jnp.int32)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(batch, cfg.n_samples) * 0.1)
                        .astype(np.float32))

    @jax.jit
    def run(params, audio, prompt):
        mel = log_mel_spectrogram(audio, cfg)
        enc = encoder_forward(params, cfg, mel)
        bias = jnp.zeros((cfg.vocab_size,), jnp.float32
                         ).at[cfg.eot_token].set(-1e9)
        return greedy_decode(params, cfg, enc, prompt,
                             max_new=gen_tokens - 1, logit_bias=bias)

    run(params, audio, prompt).tokens.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run(params, audio, prompt).tokens.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    return {
        "metric": f"rtfx_{model}_b{batch}_{dtype}_greedy{gen_tokens}",
        "value": round(batch * cfg.chunk_length_s / p50, 2),
        "unit": "audio_s_per_wall_s",
        "p50_e2e_s": round(p50, 4),
        "batch": batch, "dtype": dtype, "model": model,
    }


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="tiny")
    p.add_argument("--batches", default="1,8")
    p.add_argument("--dtypes", default="float32,bfloat16")
    p.add_argument("--gen-tokens", type=int, default=89)
    args = p.parse_args()
    for batch in (int(b) for b in args.batches.split(",")):
        for dtype in args.dtypes.split(","):
            print(json.dumps(bench_one(args.model, batch, dtype,
                                       args.gen_tokens)), flush=True)


if __name__ == "__main__":
    main()
