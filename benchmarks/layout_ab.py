"""Layout-pinned split decode: stop XLA from relaying cross-KV at the
stage1|loop program boundary.

DESIGN.md §25(4) measured the decode-loop program holding ~2x one
micro-batch's cross-KV (XLA transposes both k and v into the loop's
preferred layout as loop-invariant copies) — at medium b32 bf16 that is
most of the 17.2 GB that keeps the config off one 16 GB chip, and at
every size it is a whole-cross HBM read+write per batch.

The fix under test (jax.experimental.layout):
  1. Compile the decode loop with Format(Layout.AUTO) inputs — the
     compiler picks its preferred parameter layouts instead of the
     defaults.
  2. Pin stage1's out_shardings to exactly those formats, so stage1
     MATERIALIZES cross-KV (and the cache/tokens/logits) in the layout
     the loop wants; the loop's internal relayout copies disappear.
  3. device_put params once into the loop's preferred weight formats
     (shared by the pinned stage1 via its in_shardings).

A/B protocol (same steady drive as stage_walls.py): K back-to-back async
executions synced once, per side. Reports per-program memory_analysis
(the capacity claim) and walls (the time claim).

Run: python benchmarks/layout_ab.py [--model tiny] [--batch 32]
     [--wq] [--cq] [--gen2 25]
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
from jax.experimental.layout import Format, Layout

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def default_m2m(ndim: int) -> tuple[int, ...]:
    return tuple(range(ndim))


def count_nondefault(fmt_tree) -> int:
    leaves = jax.tree.leaves(fmt_tree,
                             is_leaf=lambda x: isinstance(x, Format))
    n = 0
    for f in leaves:
        if f.layout is None:  # backend left it unspecified == default
            continue
        m2m = f.layout.major_to_minor
        if tuple(m2m) != default_m2m(len(m2m)):
            n += 1
    return n


def mem(compiled) -> dict:
    m = compiled.memory_analysis()
    return {
        "args_mb": round(m.argument_size_in_bytes / 2**20, 1),
        "out_mb": round(m.output_size_in_bytes / 2**20, 1),
        "temp_mb": round(m.temp_size_in_bytes / 2**20, 1),
        "total_gb": round((m.argument_size_in_bytes + m.output_size_in_bytes
                           + m.temp_size_in_bytes) / 2**30, 2),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--k", type=int, default=8)
    ap.add_argument("--gen", type=int, default=89)
    ap.add_argument("--gen2", type=int, default=0)
    ap.add_argument("--wq", action="store_true")
    ap.add_argument("--cq", action="store_true")
    ap.add_argument("--skip-baseline", action="store_true",
                    help="only compile/measure the pinned side (capacity "
                         "probes where the default side OOMs)")
    ap.add_argument("--skip-pinned", action="store_true",
                    help="only the default side: single-dispatch capacity "
                         "probe for configs the chained sweep OOMs")
    ap.add_argument("--inflight", type=int, default=2,
                    help="max outstanding executions in walls (1 = fully "
                         "serialized; capacity-marginal configs)")
    ap.add_argument("--cpu", action="store_true",
                    help="smoke-test on CPU (repins jax_platforms past the "
                         "axon sitecustomize; timings meaningless)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    B, K = args.batch, args.k

    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import _greedy_prefill, _greedy_loop
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
    rng_np = np.random.RandomState(0)
    audio = jnp.asarray((rng_np.randn(B, cfg.n_samples) * 0.1
                         ).astype(np.float32))
    key = jax.random.PRNGKey(0)

    def stage1_fn(params, audio, prompt):
        mel = log_mel_spectrogram(audio, cfg)
        enc = encoder_forward(params, cfg, mel)
        return _greedy_prefill(params, cfg, enc, prompt, total)

    def loop_fn(params, cross, cache, tokens, logits, prompt, bias, key):
        return _greedy_loop(params, cfg, cross, cache, tokens, logits,
                            prompt, bias, key, opts=None,
                            max_new=args.gen - 1)

    def wall(fn, *a):
        # Keep at most 2 outputs in flight: K live stage1 outputs would be
        # K copies of cross-KV (9.4 GB each at medium b32) — instant OOM.
        t0 = time.perf_counter()
        pending = []
        for _ in range(K):
            pending.append(fn(*a))
            if len(pending) > args.inflight:
                o = pending.pop(0)
                jax.tree.flatten(o)[0][0].block_until_ready()
                del o
        for o in pending:
            jax.tree.flatten(o)[0][0].block_until_ready()
        return (time.perf_counter() - t0) / K

    out = {"model": args.model, "batch": B, "k": K,
           "wq": args.wq, "cq": args.cq}

    # ---------- A: default layouts (the production split path) ----------
    if not args.skip_baseline:
        s1_a = jax.jit(stage1_fn).lower(params, audio, prompt).compile()
        pre = s1_a(params, audio, prompt)
        lp_a = jax.jit(loop_fn).lower(params, *pre, prompt, bias,
                                      key).compile()
        res = lp_a(params, *pre, prompt, bias, key)
        res.tokens.block_until_ready()
        out["A_stage1_mem"] = mem(s1_a)
        out["A_loop_mem"] = mem(lp_a)
        out["A_loop_ms"] = round(
            wall(lp_a, params, *pre, prompt, bias, key) * 1e3, 1)
        del pre, res  # free cross-KV before stage1 walls hold new copies

        out["A_stage1_ms"] = round(wall(s1_a, params, audio, prompt) * 1e3, 1)

        def both_a():
            p = s1_a(params, audio, prompt)
            return lp_a(params, *p, prompt, bias, key)
        out["A_steady_ms"] = round(wall(both_a) * 1e3, 1)

    if args.skip_pinned:
        print(json.dumps(out))
        return

    # ---------- B: loop AUTO inputs, stage1 outputs pinned to match ------
    # AUTO only on what crosses the stage boundary (cross/cache/tokens/
    # logits). Weights stay at default layouts: they aren't the hypothesis,
    # and device_put does not honor non-default layouts for int8 wq arrays
    # (requests (0,2,1), materializes (0,1,2) → pinned-jit arg mismatch).
    AUTO = Format(Layout.AUTO)
    lp_auto = jax.jit(loop_fn, in_shardings=(None, AUTO, AUTO, AUTO, AUTO,
                                             None, None, None))
    lowered = lp_auto.lower(params, *jax.eval_shape(stage1_fn, params, audio,
                                                    prompt),
                            prompt, bias, key)
    lp_b = lowered.compile()
    in_fmts = lp_b.input_formats[0]
    (pf, crossf, cachef, tokf, logf, promptf, biasf, keyf) = in_fmts
    out["B_loop_nondefault_inputs"] = {
        "params": count_nondefault(pf), "cross": count_nondefault(crossf),
        "cache": count_nondefault(cachef),
        "other": count_nondefault((tokf, logf, promptf, biasf, keyf)),
    }
    params_b = params
    prompt_b, bias_b, key_b = prompt, bias, key
    s1_b = jax.jit(stage1_fn,
                   out_shardings=(crossf, cachef, tokf, logf)
                   ).lower(params_b, audio, prompt_b).compile()
    pre_b = s1_b(params_b, audio, prompt_b)
    res_b = lp_b(params_b, *pre_b, prompt_b, bias_b, key_b)
    res_b.tokens.block_until_ready()
    out["B_stage1_mem"] = mem(s1_b)
    out["B_loop_mem"] = mem(lp_b)
    out["B_loop_ms"] = round(
        wall(lp_b, params_b, *pre_b, prompt_b, bias_b, key_b) * 1e3, 1)
    tok_b_arr = np.asarray(res_b.tokens)
    del pre_b, res_b  # free the big cross-KV buffers before stage1 walls
    out["B_stage1_ms"] = round(wall(s1_b, params_b, audio, prompt_b) * 1e3, 1)

    def both_b():
        p = s1_b(params_b, audio, prompt_b)
        return lp_b(params_b, *p, prompt_b, bias_b, key_b)
    out["B_steady_ms"] = round(wall(both_b) * 1e3, 1)

    if not args.skip_baseline:
        # token equality across sides (same math, different layouts)
        tok_a = np.asarray(both_a().tokens)
        out["tokens_equal"] = bool(np.array_equal(tok_a, tok_b_arr))

    if args.gen2:
        pre_b = s1_b(params_b, audio, prompt_b)
        def loop2_fn(params, cross, cache, tokens, logits, prompt, bias,
                     key):
            return _greedy_loop(params, cfg, cross, cache, tokens, logits,
                                prompt, bias, key, opts=None,
                                max_new=args.gen2 - 1)
        # pin to lp_b's chosen formats (a second AUTO solve could disagree)
        lp2_b = jax.jit(loop2_fn, in_shardings=in_fmts
                        ).lower(params_b, *pre_b, prompt_b, bias_b,
                                key_b).compile()
        lp2_b(params_b, *pre_b, prompt_b, bias_b, key_b
              ).tokens.block_until_ready()
        w2 = wall(lp2_b, params_b, *pre_b, prompt_b, bias_b, key_b)
        slope = (out["B_loop_ms"] / 1e3 - w2) / (args.gen - args.gen2)
        out["B_loop_slope_us_per_step"] = round(slope * 1e6, 1)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
