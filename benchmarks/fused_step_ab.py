"""A/B of the fused decoder-step megakernel (ops/decoder_step.py) vs the
XLA decode step, standalone (VERDICT r1 Next #1 follow-through; r2 #5 for
the large-v3-turbo shape).

Runs N chained decode steps (cache-carrying lax.scan; argmax token feeds the
next step so nothing can be CSE'd or hoisted) for
    * the XLA path: decoder_forward (single token) -> final_logits
    * decoder_step_t: the production split-loop formulation
    * the fused kernel at a sweep of cross-KV block sizes
at the chosen model's shapes, bf16, batch {8, 32}, and reports microseconds
per full step (decoder + tied logits + argmax + cache update). Two chain
lengths cancel the ~30 ms axon per-dispatch cost AND the once-per-program
weight-layout transforms (CLAUDE.md).

Params/cross enter the jitted runners as ARGUMENTS, not closure constants —
closed-over weights embed in the serialized HLO, and large-v3-turbo's
1.6 GB of constants exceeds the remote-compile helper's request limit
(HTTP 413).

Token parity between the paths is asserted on-chip as part of the run.

Usage: python benchmarks/fused_step_ab.py [--steps 64] [--batch 8,32]
       [--blocks 0,1536] [--model tiny] [--out file]
       (block 0 = auto ~4 MB tiles)
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
from whisper_tpu.decode import _make_fused_step
from whisper_tpu.models.whisper import (
    decoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
from whisper_tpu.tokenizer import build_prompt
from whisper_tpu.weights import to_device


def build_state(cfg, B, rng):
    params = to_device(init_params(cfg, rng), jnp.dtype(cfg.compute_dtype))
    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (B, cfg.n_audio_ctx, cfg.d_model),
                            jnp.dtype(cfg.compute_dtype))
    cross = precompute_cross_kv(params, cfg, enc)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    cache = init_kv_cache(cfg, B, dtype=jnp.dtype(cfg.compute_dtype))
    logits, cache = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                    cache, cross)
    last = jnp.argmax(logits[:, -1, :], axis=-1)[:, None].astype(jnp.int32)
    return params, cross, prompt.shape[1], cache, last


def make_runner(build_step, P: int, n: int):
    """build_step(params, cross, cache) -> (step_fn, cache') runs INSIDE
    the jit so weights arrive as arguments; its layout transforms execute
    once per program and cancel in the two-chain-length slope."""
    @jax.jit
    def run(params, cross, cache, last):
        step_fn, cache = build_step(params, cross, cache)

        def body(carry, i):
            cache, last = carry
            logits, cache = step_fn(last, P + i, cache)
            nxt = jnp.argmax(logits[:, -1, :], axis=-1
                             ).astype(jnp.int32)[:, None]
            return (cache, nxt), nxt[:, 0]
        (_, _), toks = jax.lax.scan(body, (cache, last),
                                    jnp.arange(n, dtype=jnp.int32))
        return toks
    return run


def time_runner(build_step, P, params, cross, cache, last,
                steps) -> tuple[float, np.ndarray]:
    long_r = make_runner(build_step, P, steps)
    short_r = make_runner(build_step, P, steps // 4)
    toks = np.asarray(jax.device_get(long_r(params, cross, cache, last)))

    def wall(r):
        r(params, cross, cache, last).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            r(params, cross, cache, last).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    per = max(wall(long_r) - wall(short_r), 0.0) / (steps - steps // 4)
    return per, toks


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=64)
    p.add_argument("--batch", default="8,32")
    p.add_argument("--blocks", default="0,1536")
    p.add_argument("--model", default="tiny")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--variants", default="xla,step_t,fused")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    cfg = get_config(args.model).replace(compute_dtype=args.dtype)
    variants = set(args.variants.split(","))
    rows = []
    for B in [int(b) for b in args.batch.split(",")]:
        params, cross, P, cache, last = build_state(cfg, B,
                                                    jax.random.PRNGKey(0))

        def xla_build(params, cross, cache):
            return (lambda l, pos, c:
                    decoder_forward(params, cfg, l, pos, c, cross)), cache

        toks_xla = None
        if "xla" in variants:
            us_xla, toks_xla = time_runner(xla_build, P, params, cross,
                                           cache, last, args.steps)
            rows.append({"batch": B, "variant": "xla",
                         "us_per_step": round(us_xla * 1e6, 1)})
            print(json.dumps(rows[-1]), flush=True)

        if "step_t" in variants:
            # production split-loop formulation (transposed loop-local cache)
            from whisper_tpu.models.whisper import (
                decoder_step_t,
                transpose_self_cache,
            )

            def t_build(params, cross, cache):
                return (lambda l, pos, c:
                        decoder_step_t(params, cfg, l, pos, c, cross)), \
                    transpose_self_cache(cache)

            us_t, toks_t = time_runner(t_build, P, params, cross, cache,
                                       last, args.steps)
            row = {"batch": B, "variant": "step_t",
                   "us_per_step": round(us_t * 1e6, 1)}
            if toks_xla is not None:
                row["tokens_match_xla"] = bool((toks_t == toks_xla).all())
            rows.append(row)
            print(json.dumps(rows[-1]), flush=True)

        if "fused" in variants:
            fcfg = cfg.replace(fused_step=True)
            for blk in [int(x) for x in args.blocks.split(",")]:
                os.environ["WHISPER_TPU_FUSED_BLOCK_CROSS"] = str(blk)

                def f_build(params, cross, cache, _fcfg=fcfg):
                    return _make_fused_step(params, _fcfg, cache, cross)

                us, toks = time_runner(f_build, P, params, cross, cache,
                                       last, args.steps)
                row = {"batch": B, "variant": f"fused_bc{blk or 'auto'}",
                       "us_per_step": round(us * 1e6, 1)}
                if toks_xla is not None:
                    row["tokens_match_xla"] = bool((toks == toks_xla).all())
                    # single-step logit delta vs XLA: distinguishes near-tie
                    # argmax flips (bf16 ulp) from real bugs
                    @jax.jit
                    def one_xla(params, cross, cache, last):
                        s, c = xla_build(params, cross, cache)
                        return s(last, jnp.int32(P), c)[0]

                    @jax.jit
                    def one_fused(params, cross, cache, last):
                        s, c = f_build(params, cross, cache)
                        return s(last, jnp.int32(P), c)[0]

                    lx = one_xla(params, cross, cache, last)
                    lf = one_fused(params, cross, cache, last)
                    dl = float(jnp.max(jnp.abs(lx.astype(jnp.float32)
                                               - lf.astype(jnp.float32))))
                    row["max_logit_delta_step1"] = round(dl, 4)
                rows.append(row)
                print(json.dumps(rows[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
