"""Decode-loop anatomy: which part of greedy_decode's per-step body costs
the 311 -> ~600 us/step gap over the bare decoder step (phases.py r2)?

Variants, each a counted lax.scan of the same decoder step plus
incrementally more of the production body (tiny bf16, chained carries,
two chain lengths cancel dispatch):

    bare       decoder_forward + argmax (the 311 us baseline)
    logprob    + fp32 log_softmax over the vocab + take_along (sum_lp)
    rng        + jax.random.split per step (temperature plumbing)
    dus        + tokens buffer: dynamic_slice read + dynamic_update_slice
               write (round-1 while-body form)
    scatter    dus form but with the .at[arange(B), col].set masked-scatter
               write (round-2 chunked form)

Usage: python benchmarks/loop_anatomy.py [--steps 32] [--batch 8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

from whisper_tpu.config import get_config
from whisper_tpu.models.whisper import (
    decoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
from whisper_tpu.tokenizer import build_prompt
from whisper_tpu.weights import to_device


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=32)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--variants", default="bare,logprob,rng,dus,scatter")
    args = p.parse_args()
    B = args.batch

    cfg = get_config("tiny").replace(compute_dtype=args.dtype)
    dtype = jnp.dtype(args.dtype)
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), dtype)
    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.n_audio_ctx, cfg.d_model), dtype)
    cross = precompute_cross_kv(params, cfg, enc)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    P = prompt.shape[1]
    cache0 = init_kv_cache(cfg, B, dtype=dtype)
    logits0, cache0 = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                      cache0, cross)
    first = jnp.argmax(logits0[:, -1, :], axis=-1).astype(jnp.int32)
    total = P + 1 + args.steps + 16
    tokens0 = jnp.full((B, total), cfg.eot_token, jnp.int32)
    tokens0 = jax.lax.dynamic_update_slice(tokens0, prompt, (0, 0))
    tokens0 = tokens0.at[:, P].set(first)

    def make_body(variant):
        def body(carry, i):
            tokens, cache, finished, sum_lp, rng = carry
            if variant in ("dus", "scatter"):
                last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
            else:
                last = tokens[:, P:P + 1]     # constant index: no dyn read
            logits, cache = decoder_forward(params, cfg, last, P + i,
                                            cache, cross)
            l = logits[:, -1, :]
            nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
            if variant != "bare":
                lp = jax.nn.log_softmax(l.astype(jnp.float32), axis=-1)
                sum_lp = sum_lp + jnp.take_along_axis(
                    lp, nxt[:, None], axis=-1)[:, 0]
            if variant in ("rng", "dus", "scatter"):
                rng, _ = jax.random.split(rng)
            nxt = jnp.where(finished, jnp.int32(cfg.eot_token), nxt)
            finished = jnp.logical_or(finished, nxt == cfg.eot_token + 10**9)
            if variant == "dus":
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, P + i + 1))
            elif variant == "scatter":
                col = jnp.minimum(P + i + 1, tokens.shape[1] - 1)
                cur = tokens[jnp.arange(B), col]
                tokens = tokens.at[jnp.arange(B), col].set(
                    jnp.where(finished, cur, nxt))
            else:
                tokens = tokens.at[:, P].set(nxt)   # keep carry live
            return (tokens, cache, finished, sum_lp, rng), ()
        return body

    def timed(variant, n):
        # "<v>_args" passes params/cross as jit ARGUMENTS (the production
        # calling convention); bare "<v>" closes over them as constants —
        # isolates whether XLA treats embedded weights differently.
        as_args = variant.endswith("_args")
        body = make_body(variant.removesuffix("_args"))

        @jax.jit
        def run_args(p_, cr_, tokens, cache):
            nonlocal params, cross
            saved_p, saved_c = params, cross
            # make_body closes over the module-level names; rebind them to
            # the traced arguments for this trace, then restore
            params, cross = p_, cr_
            try:
                carry = (tokens, cache, jnp.zeros((B,), bool),
                         jnp.zeros((B,), jnp.float32), jax.random.PRNGKey(0))
                carry, _ = jax.lax.scan(body, carry,
                                        jnp.arange(n, dtype=jnp.int32))
            finally:
                params, cross = saved_p, saved_c
            return carry[0], carry[3], carry[4]

        @jax.jit
        def run(tokens, cache):
            carry = (tokens, cache, jnp.zeros((B,), bool),
                     jnp.zeros((B,), jnp.float32), jax.random.PRNGKey(0))
            carry, _ = jax.lax.scan(body, carry,
                                    jnp.arange(n, dtype=jnp.int32))
            # every carried quantity stays live: dead-code elimination must
            # not strip the op under measurement
            return carry[0], carry[3], carry[4]

        call = (lambda: run_args(params, cross, tokens0, cache0)) \
            if as_args else (lambda: run(tokens0, cache0))
        jax.block_until_ready(call())
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            jax.block_until_ready(call())
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    def timed_greedy(variant, n):
        """The REAL greedy_decode (production path), params as args or
        closed over as compile-time constants."""
        from whisper_tpu.decode import greedy_decode

        bias = jnp.zeros((cfg.vocab_size,), jnp.float32
                         ).at[cfg.eot_token].set(-1e9)
        if variant == "greedy_args":
            @jax.jit
            def run(p_, e_, pr_):
                return greedy_decode(p_, cfg, e_, pr_, max_new=n - 1,
                                     logit_bias=bias).tokens
            call = lambda: run(params, enc, prompt)
        else:                       # greedy_closure
            @jax.jit
            def run(e_, pr_):
                return greedy_decode(params, cfg, e_, pr_, max_new=n - 1,
                                     logit_bias=bias).tokens
            call = lambda: run(enc, prompt)
        call().block_until_ready()
        ts = []
        for _ in range(9):
            t0 = time.perf_counter()
            call().block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    for variant in args.variants.split(","):
        t = timed_greedy if variant.startswith("greedy") else timed
        w_long = t(variant, args.steps)
        w_short = t(variant, args.steps // 4)
        us = (w_long - w_short) / (args.steps - args.steps // 4) * 1e6
        print(json.dumps({"variant": variant, "batch": B,
                          "us_per_step": round(us, 1)}), flush=True)


if __name__ == "__main__":
    main()
