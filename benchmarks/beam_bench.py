"""Beam-search RTFx on the real TPU (VERDICT r2 #7 gate: beam-5 b8 >= 700).

Methodology matches bench.py: random tiny weights, synthetic clips, 89
generated tokens (random weights never rank EOT into the beam, so work is
fixed); eager beam_decode dispatches the split prefill|loop stages. The
KV gather on beam hops is the measured variable — r2 gathered all 448
padded slots (476 RTFx at beam-5 b8); r3 permutes only the valid prefix.

Usage: python benchmarks/beam_bench.py [--batch 8] [--beam 5]
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


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--beam", type=int, default=5)
    p.add_argument("--model", default="tiny")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--gen-tokens", type=int, default=89)
    p.add_argument("--wq", action="store_true",
                   help="weight-only int8 decoder weights (§28)")
    p.add_argument("--cq", action="store_true",
                   help="scale-commuted int8 cross-KV (§29)")
    p.add_argument("--sq", action="store_true",
                   help="scale-commuted int8 self-KV cache (§35)")
    p.add_argument("--serving-defaults", action="store_true",
                   help="apply_serving_quant(cfg, batch) — the shipped "
                        "width x depth x batch policy (r4+: sq on at "
                        "d>=1024 deep decoders)")
    args = p.parse_args()

    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import beam_decode, encode
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    cfg = get_config(args.model).replace(compute_dtype=args.dtype,
                                         weight_quant=args.wq,
                                         cross_kv_quant=args.cq,
                                         self_kv_quant=args.sq)
    if args.serving_defaults:
        from whisper_tpu.config import apply_serving_quant
        # effective decode rows = batch * beam (the rows amortize the
        # per-step quant overhead; see apply_serving_quant docstring)
        cfg = apply_serving_quant(cfg, batch=args.batch * args.beam)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.dtype == "bfloat16":
        params = to_device(params, jnp.bfloat16)
    if cfg.weight_quant:
        from whisper_tpu.models.whisper import quantize_weights_wq
        params = quantize_weights_wq(params, cfg)
    B = args.batch
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, cfg.n_samples) * 0.1)
                        .astype(np.float32))

    def run():
        # e2e like bench.py (mel + encoder + beam decode) so the RTFx is
        # comparable to the r2 476 figure and the greedy headline
        mel = log_mel_spectrogram(audio, cfg)
        enc = encode(params, cfg, mel)
        return beam_decode(params, cfg, enc, prompt, beam_size=args.beam,
                           max_new=args.gen_tokens - 1)

    run().tokens.block_until_ready()        # compile
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        run().tokens.block_until_ready()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    rtfx = B * cfg.chunk_length_s / p50
    print(json.dumps({
        "metric": f"rtfx_beam{args.beam}_{args.model}_b{B}",
        "value": round(rtfx, 1), "p50_s": round(p50, 4),
        "dtype": args.dtype, "gen_tokens": args.gen_tokens,
        "weight_quant": cfg.weight_quant, "cross_quant": cfg.cross_kv_quant,
        "self_quant": cfg.self_kv_quant,
        "encoder_mlp_quant": cfg.encoder_mlp_quant,
        "encoder_qkv_quant": cfg.encoder_qkv_quant,
    }))


if __name__ == "__main__":
    main()
