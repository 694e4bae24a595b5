"""Bisect the production decode-loop's per-step cost at batch 32.

stage_walls.py's two-length fit showed the production loop program costs
~1152 us/step SLOPE with only ~2.5 ms fixed — i.e. the steps themselves
are ~2x the ~540 us/step §13 measured for a clean scan-of-decoder-step
program. This harness measures the same two-length slope for incremental
reconstructions of the production body, all compiled as their OWN
programs (the §13 condition), to locate the 2x:

    scan_t        lax.scan of decoder_step_t + argmax + in-carry token
    scan_t_pick   + the production `pick` (logit bias + fp32 log_softmax
                  + take_along) and masked scatter token write
    scan_fwd      decoder_forward (untransposed cache) + argmax
    prod          the real _jit_greedy_loop (use_t=True, bias) — baseline
    prod_nobias   logit_bias=None
    prod_fwd      use_t=False (decoder_forward inside the real loop)

Run: python benchmarks/loop_bisect.py [--batch 32] [--variants ...]
One JSON line per variant: {"variant", "us_per_step", "fixed_ms"}.
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

N_LONG, N_SHORT, K = 96, 24, 6


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--variants",
                    default="prod,prod_nobias,prod_fwd,scan_t,scan_t_pick,"
                            "scan_fwd")
    args = ap.parse_args()
    B = args.batch

    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import _greedy_prefill, _jit_greedy_loop
    from whisper_tpu.models.whisper import (
        decoder_forward,
        decoder_step_t,
        encoder_forward,
        init_params,
    )
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    cfg = get_config("tiny").replace(compute_dtype="bfloat16")
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    P = prompt.shape[1]
    total = P + N_LONG + 1
    bias = jnp.zeros((cfg.vocab_size,), jnp.float32
                     ).at[cfg.eot_token].set(-1e9)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, cfg.n_samples) * 0.1).astype(np.float32))

    import functools

    @functools.partial(jax.jit, static_argnames=("use_t",))
    def stage1(audio, use_t: bool = True):
        mel = log_mel_spectrogram(audio, cfg)
        enc = encoder_forward(params, cfg, mel)
        return _greedy_prefill(params, cfg, enc, prompt, total, use_t=use_t)

    pre_t = jax.block_until_ready(stage1(audio))
    pre_f = jax.block_until_ready(stage1(audio, use_t=False))

    def wall(call):
        call()  # warmup (compile)
        t0 = time.perf_counter()
        outs = [call() for _ in range(K)]
        for o in outs:
            jax.tree.flatten(o)[0][0].block_until_ready()
        return (time.perf_counter() - t0) / K

    def slope(make_call):
        w_long = wall(make_call(N_LONG))
        w_short = wall(make_call(N_SHORT))
        us = (w_long - w_short) / (N_LONG - N_SHORT) * 1e6
        fixed = (w_long - us * 1e-6 * N_LONG) * 1e3
        return round(us, 1), round(fixed, 1)

    # ---- real-loop variants -------------------------------------------
    def prod_call(pre, b, use_t):
        def make(n):
            def call():
                cross, cache, tokens, logits = pre
                return _jit_greedy_loop(
                    params, cfg, cross, cache, tokens, logits, prompt, b,
                    jax.random.PRNGKey(0), opts=None, max_new=n,
                    use_t=use_t).tokens
            return call
        return make

    # ---- clean-scan variants (own jit, counted scan, carries live) ----
    def make_scan(step_kind: str, pick_full: bool):
        def make(n):
            pre = pre_t if step_kind == "t" else pre_f
            cross, cache0, tokens0, logits0 = pre
            first = jnp.argmax(logits0[:, -1, :], axis=-1).astype(jnp.int32)
            tokens0 = tokens0.at[:, P].set(first)
            eot = jnp.int32(cfg.eot_token)

            def body(carry, i):
                tokens, cache, finished, sum_lp = carry
                last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
                if step_kind == "t":
                    logits, cache = decoder_step_t(params, cfg, last, P + i,
                                                   cache, cross)
                else:
                    logits, cache = decoder_forward(params, cfg, last, P + i,
                                                    cache, cross)
                l = logits[:, -1, :]
                if pick_full:
                    l = l + bias[None, :]
                    nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
                    lp = jax.nn.log_softmax(l.astype(jnp.float32), axis=-1)
                    sum_lp = sum_lp + jnp.take_along_axis(
                        lp, nxt[:, None], axis=-1)[:, 0]
                    live = jnp.logical_not(finished)
                    nxt = jnp.where(live, nxt, eot)
                    col = jnp.minimum(P + i + 1, tokens.shape[1] - 1)
                    cur = tokens[jnp.arange(B), col]
                    tokens = tokens.at[jnp.arange(B), col].set(
                        jnp.where(live | finished, nxt, cur))
                    finished = jnp.logical_or(finished, nxt == eot)
                else:
                    nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
                    tokens = jax.lax.dynamic_update_slice(
                        tokens, nxt[:, None], (0, P + i + 1))
                return (tokens, cache, finished, sum_lp), ()

            @jax.jit
            def run(tokens, cache):
                carry = (tokens, cache, jnp.zeros((B,), bool),
                         jnp.zeros((B,), jnp.float32))
                carry, _ = jax.lax.scan(body, carry,
                                        jnp.arange(n, dtype=jnp.int32))
                return carry[0], carry[3]

            return lambda: run(tokens0, cache0)
        return make

    variants = {
        "prod": lambda: prod_call(pre_t, bias, True),
        "prod_nobias": lambda: prod_call(pre_t, None, True),
        "prod_fwd": lambda: prod_call(pre_f, bias, False),
        "scan_t": lambda: make_scan("t", False),
        "scan_t_pick": lambda: make_scan("t", True),
        "scan_fwd": lambda: make_scan("fwd", False),
    }
    for v in args.variants.split(","):
        us, fixed = slope(variants[v]())
        print(json.dumps({"variant": v, "batch": B, "us_per_step": us,
                          "fixed_ms": fixed}), flush=True)


if __name__ == "__main__":
    main()
