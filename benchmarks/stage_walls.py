"""Decompose the steady-state per-batch wall into per-stage program walls.

DESIGN.md §18 attributed the ~55 ms/batch steady residual (over the
~70 ms phase-sum compute) to a non-overlappable per-program tunnel cost;
the stage1-chaining result (§19: only ~2 ms/batch saved by cutting stage1
dispatches 8x) falsifies that attribution for stage1. This harness times
each stage as K back-to-back async executions synced once — the same drive
mode as the steady bench — so per-execution wall includes exactly the
overhead the steady loop pays, per stage.

Run: python benchmarks/stage_walls.py [--batch 32] [--k 8]
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
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--gen", type=int, default=89)
    ap.add_argument("--gen2", type=int, default=0,
                    help="second gen length; fits wall = fixed + gen*slope "
                         "to split per-program fixed cost from per-step cost")
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--wq", action="store_true",
                    help="weight-only int8 decoder weights (DESIGN.md §28)")
    ap.add_argument("--cq", action="store_true",
                    help="scale-commuted int8 cross-KV (DESIGN.md §29)")
    args = ap.parse_args()
    B, K = args.batch, args.k

    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import _greedy_prefill, _jit_greedy_loop
    from whisper_tpu.models.whisper import encoder_forward, init_params
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    cfg = get_config(args.model).replace(compute_dtype="bfloat16",
                                         cross_kv_quant=args.cq,
                                         weight_quant=args.wq)
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    if args.wq:
        from whisper_tpu.models.whisper import quantize_weights_wq
        params = quantize_weights_wq(params, cfg)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    total = prompt.shape[1] + args.gen
    bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
    bias = bias.at[cfg.eot_token].set(-1e9)

    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, cfg.n_samples) * 0.1).astype(np.float32))

    # params as an explicit jit arg (NOT a closure): closed-over weights
    # embed in the program shipped to the remote AOT compiler — medium's
    # ~1.5 GB payload breaks the tunnel (same bug class as bench.py's
    # chained runner, r3)
    @jax.jit
    def _stage1(params, audio):
        mel = log_mel_spectrogram(audio, cfg)
        enc = encoder_forward(params, cfg, mel)
        return _greedy_prefill(params, cfg, enc, prompt, total)

    def stage1(audio):
        return _stage1(params, audio)

    def loop(pre, gen=args.gen):
        cross, cache, tokens, logits = pre
        return _jit_greedy_loop(params, cfg, cross, cache, tokens, logits,
                                prompt, bias, jax.random.PRNGKey(0),
                                opts=None, max_new=gen - 1)

    # warmup/compile both
    pre = stage1(audio)
    res = loop(pre)
    res.tokens.block_until_ready()

    def wall(fn, inp):
        # bound in-flight outputs: K live stage1 results = K cross-KV
        # copies (1.8 GB each at small b32) — OOM at medium/small sizes
        t0 = time.perf_counter()
        pending = []
        for _ in range(K):
            pending.append(fn(inp))
            if len(pending) > 2:
                o = pending.pop(0)
                jax.tree.flatten(o)[0][0].block_until_ready()
                del o
        for o in pending:
            jax.tree.flatten(o)[0][0].block_until_ready()
        return (time.perf_counter() - t0) / K

    lp = wall(loop, pre)
    s1 = wall(stage1, audio)

    # the combined steady drive (what bench.py measures), for the residual
    t0 = time.perf_counter()
    pending = []
    for _ in range(K):
        pending.append(loop(stage1(audio)))
        if len(pending) > 2:
            pending.pop(0).tokens.block_until_ready()
    for o in pending:
        o.tokens.block_until_ready()
    both = (time.perf_counter() - t0) / K

    out = {
        "batch": B, "k": K,
        "stage1_ms": round(s1 * 1e3, 1),
        "loop_ms": round(lp * 1e3, 1),
        "sum_ms": round((s1 + lp) * 1e3, 1),
        "steady_both_ms": round(both * 1e3, 1),
        "residual_ms": round((both - s1 - lp) * 1e3, 1),
        "loop_us_per_step": round(lp * 1e6 / args.gen, 1),
    }

    if args.gen2:
        # second loop length on the SAME stage1 outputs: wall = fixed +
        # steps*slope splits per-program fixed cost from true per-step cost
        loop(pre, gen=args.gen2).tokens.block_until_ready()  # compile
        lp2 = wall(lambda p: loop(p, gen=args.gen2), pre)
        slope = (lp - lp2) / (args.gen - args.gen2)
        out.update({
            "gen2": args.gen2,
            "loop2_ms": round(lp2 * 1e3, 1),
            "loop_slope_us_per_step": round(slope * 1e6, 1),
            "loop_fixed_ms": round((lp - slope * args.gen) * 1e3, 1),
        })

    print(json.dumps(out))


if __name__ == "__main__":
    main()
