"""Speculative-decoding bounds on the chip.

Random weights cannot demonstrate REAL speculative speedup — a random
draft never agrees with a random target, so acceptance is ~0. What we
can measure honestly is the acceptance-conditional envelope:

  * upper bound: draft == target (every window fully accepted, m=k):
    per-token cost of [k draft steps + one (k+1)-verify] / (k+1).
    With a cheap draft this is the best spec-dec can ever do.
  * lower bound: cross-seed draft (m ~= 0): every round pays
    [k draft steps + verify] for ONE token — the worst case.
  * reference: plain greedy on the target (bench.py's loop, same drive).

Real checkpoints land between the bounds at Whisper's typical 60-85%
per-token draft agreement. Reports per-token walls for each regime plus
the break-even acceptance rate.

Run: python benchmarks/spec_bench.py --target large-v2 --draft base \
       [--batch 1] [--k 4] [--gen 89] [--kk 8]
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
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="large-v2")
    ap.add_argument("--draft", default="base")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--gen", type=int, default=89)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    B = args.batch

    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import apply_serving_quant, get_config
    from whisper_tpu.decode import greedy_decode
    from whisper_tpu.models.whisper import (encoder_forward, init_params,
                                            quantize_weights_wq)
    from whisper_tpu.speculative import speculative_decode
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    def build(name, seed):
        cfg = apply_serving_quant(
            get_config(name).replace(compute_dtype="bfloat16"))
        params = to_device(init_params(cfg, jax.random.PRNGKey(seed)),
                           jnp.bfloat16)
        if cfg.weight_quant:
            params = quantize_weights_wq(params, cfg)
        return cfg, params

    t_cfg, t_params = build(args.target, 0)
    d_cfg, d_params = build(args.draft, 3)

    rng = np.random.RandomState(0)
    t = np.arange(t_cfg.n_samples) / t_cfg.sample_rate
    audio = np.stack([0.3 * np.sin(2 * np.pi * (200 + 40 * b) * t)
                      + 0.05 * rng.randn(t_cfg.n_samples)
                      for b in range(B)]).astype(np.float32)
    audio = jnp.asarray(audio)
    t_enc = encoder_forward(t_params, t_cfg,
                            log_mel_spectrogram(audio, t_cfg))
    d_enc = encoder_forward(d_params, d_cfg,
                            log_mel_spectrogram(audio, d_cfg))
    jax.block_until_ready((t_enc, d_enc))
    prompt = jnp.asarray(np.tile(build_prompt(t_cfg), (B, 1)), jnp.int32)
    bias = jnp.zeros((t_cfg.vocab_size,), jnp.float32
                     ).at[t_cfg.eot_token].set(-1e9)

    def timed(fn, *a, **kw):
        def split(out):
            # DecodeResult is itself a NamedTuple; (result, stats) pairs
            # are plain 2-tuples from return_stats=True
            if hasattr(out, "tokens"):
                return out, None
            return out[0], {k: int(v) for k, v in out[1].items()}
        res, _ = split(fn(*a, **kw))
        res.tokens.block_until_ready()               # compile+warm
        best, stats = float("inf"), None
        for _ in range(args.reps):
            t0 = time.perf_counter()
            res, st = split(fn(*a, **kw))
            res.tokens.block_until_ready()
            best = min(best, time.perf_counter() - t0)
            stats = st or stats
        return best, stats

    w_greedy, _ = timed(greedy_decode, t_params, t_cfg, t_enc, prompt,
                        max_new=args.gen - 1, logit_bias=bias)
    d_prompt = jnp.asarray(np.tile(build_prompt(d_cfg), (B, 1)), jnp.int32)
    d_bias = jnp.zeros((d_cfg.vocab_size,), jnp.float32
                       ).at[d_cfg.eot_token].set(-1e9)
    w_greedy_draft, _ = timed(greedy_decode, d_params, d_cfg, d_enc,
                              d_prompt, max_new=args.gen - 1,
                              logit_bias=d_bias)
    w_upper, st_up = timed(speculative_decode, t_params, t_cfg, t_params,
                           t_cfg, t_enc, t_enc, prompt,
                           max_new=args.gen - 1, k=args.k,
                           logit_bias=bias, return_stats=True)
    w_lower, st_lo = timed(speculative_decode, t_params, t_cfg, d_params,
                           d_cfg, t_enc, d_enc, prompt,
                           max_new=args.gen - 1, k=args.k,
                           logit_bias=bias, return_stats=True)

    per_tok = {r: w / args.gen * 1e3 for r, w in
               [("greedy", w_greedy), ("spec_upper", w_upper),
                ("spec_lower", w_lower)]}
    # Break-even per-token draft agreement a*: a spec round costs
    # ~w_lower/rounds_lower (every lower-bound round emits 1 token) and
    # emits E[m]+1 = sum_{i=0..k} a^i tokens in expectation under lockstep
    # acceptance. Solve sum a^i = round_cost / greedy_per_token.
    g = w_greedy / args.gen
    round_cost = w_lower / max(st_lo["rounds"], 1)
    need = round_cost / g
    k = args.k
    a_star = None
    if need <= 1.0:
        a_star = 0.0                     # spec wins even at zero acceptance
    elif need < k + 1:
        lo, hi = 0.0, 1.0
        for _ in range(60):              # bisect sum_{i=0..k} a^i = need
            mid = (lo + hi) / 2
            s = sum(mid ** i for i in range(k + 1))
            lo, hi = (mid, hi) if s < need else (lo, mid)
        a_star = (lo + hi) / 2
    # Fully-measured cheap-draft envelope: the lower run's round cost IS
    # the cheap-draft round (k draft steps + one (k+1)-verify + glue); in
    # the full-acceptance regime the same round emits k+1 tokens, and at
    # per-token draft agreement `a` it emits sum_{i=0..k} a^i in
    # expectation — so speedup(a) = greedy_per_tok * sum a^i / round_cost.
    def speedup_at(a):
        return g * sum(a ** i for i in range(k + 1)) / round_cost

    print(json.dumps({
        "target": args.target, "draft": args.draft, "batch": B,
        "k": args.k, "gen": args.gen,
        "greedy_ms": round(w_greedy * 1e3, 1),
        "draft_greedy_ms": round(w_greedy_draft * 1e3, 1),
        "spec_upper_ms": round(w_upper * 1e3, 1),
        "spec_lower_ms": round(w_lower * 1e3, 1),
        "per_token_ms": {r: round(v, 3) for r, v in per_tok.items()},
        "upper_speedup": round(w_greedy / w_upper, 2),
        "lower_slowdown": round(w_lower / w_greedy, 2),
        "rounds_upper": st_up["rounds"], "rounds_lower": st_lo["rounds"],
        "accepted_upper": st_up["accepted_drafts"],
        "accepted_lower": st_lo["accepted_drafts"],
        "round_cost_ms": round(round_cost * 1e3, 3),
        "cheap_upper_per_tok_ms": round(round_cost / (k + 1) * 1e3, 3),
        "cheap_upper_speedup": round(speedup_at(1.0), 2),
        "speedup_at_acceptance": {str(a): round(speedup_at(a), 2)
                                  for a in (0.6, 0.7, 0.8, 0.9)},
        "breakeven_acceptance": (None if a_star is None
                                 else round(a_star, 3)),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
