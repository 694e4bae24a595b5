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
    def prod_call(pre, b, use_t, cfg_=None):
        def make(n):
            def call():
                cross, cache, tokens, logits = pre
                return _jit_greedy_loop(
                    params, cfg_ or cfg, cross, cache, tokens, logits,
                    prompt, b, jax.random.PRNGKey(0), opts=None, max_new=n,
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

            def body(params, cross, carry, i):
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
            def run(params, cross, tokens, cache):
                carry = (tokens, cache, jnp.zeros((B,), bool),
                         jnp.zeros((B,), jnp.float32))
                carry, _ = jax.lax.scan(
                    lambda c, i: body(params, cross, c, i), carry,
                    jnp.arange(n, dtype=jnp.int32))
                return carry[0], carry[3]

            return lambda: run(params, cross, tokens0, cache0)
        return make

    # ---- ablation variants: the decoder_step_t math with one component
    # removed, so the two-length delta vs "abl_none" attributes the cost
    # of exactly that component INSIDE the real loop context (fusion
    # effects included). Local restatement of models/whisper.decoder_step_t
    # (bf16 operands, f32 accumulation) with skip flags.
    from whisper_tpu.models.whisper import (
        final_logits,
        gelu,
        layer_norm,
        linear,
        merge_heads,
        qkv_fused,
        split_heads,
    )

    def step_abl(params, cfg, last, pos, cache, cross, skip: frozenset):
        dec = params["decoder"]
        dtype = jnp.dtype(cfg.compute_dtype)
        f32 = jnp.float32
        S = cache["k"].shape[-1]
        D = cfg.head_dim
        h = dec["tok_emb"][last].astype(dtype)
        h = h + dec["pos_emb"][pos][None, None, :].astype(dtype)
        key_mask = (jnp.arange(S) < pos + 1)[None, None, None, :]

        def att(q, k, v, k_eq, v_eq, mask):
            s = jnp.einsum(k_eq, q, k, preferred_element_type=f32
                           ) * (D ** -0.5)
            if mask is not None:
                s = jnp.where(mask, s, jnp.finfo(f32).min)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum(v_eq, p.astype(dtype), v,
                              preferred_element_type=f32).astype(dtype)

        def block(h, xs):
            lp, cache_l, cross_l = xs
            kc, vc = cache_l["k"], cache_l["v"]
            if "self" not in skip:
                r = h
                y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"],
                               cfg.ln_eps)
                q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
                if "append" not in skip:
                    kc = jax.lax.dynamic_update_slice(
                        kc, k_new.transpose(0, 1, 3, 2).astype(kc.dtype),
                        (0, 0, 0, pos))
                    vc = jax.lax.dynamic_update_slice(
                        vc, v_new.transpose(0, 1, 3, 2).astype(vc.dtype),
                        (0, 0, 0, pos))
                a = att(q, kc.astype(dtype), vc.astype(dtype),
                        "bthd,bhds->bhts", "bhts,bhds->bthd", key_mask)
                h = r + linear(merge_heads(a), lp["attn"]["o"])
            if "cross" not in skip:
                r = h
                y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"],
                               cfg.ln_eps)
                q = split_heads(linear(y, lp["cross_attn"]["q"]),
                                cfg.n_heads)
                a = att(q, cross_l["k"].astype(dtype),
                        cross_l["v"].astype(dtype),
                        "bthd,bhsd->bhts", "bhts,bhsd->bthd", None)
                h = r + linear(merge_heads(a), lp["cross_attn"]["o"])
            if "mlp" not in skip:
                r = h
                y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"],
                               cfg.ln_eps)
                h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
            return h, {"k": kc, "v": vc}

        h, new_cache = jax.lax.scan(
            block, h, (dec["layers"], cache, cross), unroll=True)
        if "logits" in skip:
            # keep the carry live through a cheap projection-free readout
            logits = jnp.broadcast_to(
                jnp.sum(h, axis=-1, keepdims=True), h.shape[:2] + (8,)
            ).astype(f32)
        else:
            logits = final_logits(params, cfg, h)
        return logits, new_cache

    def step_flat(params, cfg, last, pos, cache, cross):
        """decoder_step_t math, but the layer loop is a PYTHON loop with
        static layer indices updating ONE (L,B,H,D,S) cache buffer via
        dynamic_update_slice — no scan-over-layers carry/stacking, so XLA
        can alias the cache across while iterations and each append is a
        single column write instead of a per-layer restack."""
        dec = params["decoder"]
        dtype = jnp.dtype(cfg.compute_dtype)
        f32 = jnp.float32
        S = cache["k"].shape[-1]
        D = cfg.head_dim
        L = cfg.n_text_layers
        h = dec["tok_emb"][last].astype(dtype)
        h = h + dec["pos_emb"][pos][None, None, :].astype(dtype)
        key_mask = (jnp.arange(S) < pos + 1)[None, None, None, :]

        def att(q, k, v, k_eq, v_eq, mask):
            s = jnp.einsum(k_eq, q, k, preferred_element_type=f32
                           ) * (D ** -0.5)
            if mask is not None:
                s = jnp.where(mask, s, jnp.finfo(f32).min)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum(v_eq, p.astype(dtype), v,
                              preferred_element_type=f32).astype(dtype)

        kc_all, vc_all = cache["k"], cache["v"]
        for li in range(L):
            lp = jax.tree.map(lambda x: x[li], dec["layers"])
            r = h
            y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"],
                           cfg.ln_eps)
            q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
            kc_all = jax.lax.dynamic_update_slice(
                kc_all, k_new.transpose(0, 1, 3, 2)[None].astype(
                    kc_all.dtype), (li, 0, 0, 0, pos))
            vc_all = jax.lax.dynamic_update_slice(
                vc_all, v_new.transpose(0, 1, 3, 2)[None].astype(
                    vc_all.dtype), (li, 0, 0, 0, pos))
            a = att(q, kc_all[li].astype(dtype), vc_all[li].astype(dtype),
                    "bthd,bhds->bhts", "bhts,bhds->bthd", key_mask)
            h = r + linear(merge_heads(a), lp["attn"]["o"])
            r = h
            y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"],
                           cfg.ln_eps)
            qx = split_heads(linear(y, lp["cross_attn"]["q"]), cfg.n_heads)
            a = att(qx, cross["k"][li].astype(dtype),
                    cross["v"][li].astype(dtype),
                    "bthd,bhsd->bhts", "bhts,bhsd->bthd", None)
            h = r + linear(merge_heads(a), lp["cross_attn"]["o"])
            r = h
            y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"],
                           cfg.ln_eps)
            h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return final_logits(params, cfg, h), {"k": kc_all, "v": vc_all}

    def make_flat():
        def make(n):
            cross, cache0, tokens0, logits0 = pre_t
            first = jnp.argmax(logits0[:, -1, :], axis=-1).astype(jnp.int32)
            tokens0 = tokens0.at[:, P].set(first)

            def body(params, cross, carry, i):
                tokens, cache = carry
                last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
                logits, cache = step_flat(params, cfg, last, P + i, cache,
                                          cross)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1
                                 ).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, P + i + 1))
                return (tokens, cache), ()

            @jax.jit
            def run(params, cross, tokens, cache):
                carry = (tokens, cache)
                carry, _ = jax.lax.scan(
                    lambda c, i: body(params, cross, c, i), carry,
                    jnp.arange(n, dtype=jnp.int32))
                return carry[0]

            return lambda: run(params, cross, tokens0, cache0)
        return make

    def step_inplace(params, cfg, last, pos, cache, cross,
                     skip: frozenset = frozenset()):
        """Standard (L,B,H,S,D) cache, READ-ONLY inside the layer scan:
        the current token's self-attention term is folded in explicitly
        (strict `< pos` cache mask + a rank-1 softmax extension from
        k_new/v_new), and all layers' new rows are written by ONE aliased
        Pallas cache_append_rows call at the end — no per-step cache
        rewrite anywhere in the XLA graph."""
        from whisper_tpu.ops.cache_append import cache_append_rows
        dec = params["decoder"]
        dtype = jnp.dtype(cfg.compute_dtype)
        f32 = jnp.float32
        S = cache["k"].shape[-2]
        D = cfg.head_dim
        h = dec["tok_emb"][last].astype(dtype)
        h = h + dec["pos_emb"][pos][None, None, :].astype(dtype)
        strict_mask = (jnp.arange(S) < pos)[None, None, None, :]

        def block(h, xs):
            lp, cache_l, cross_l = xs
            r = h
            y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"],
                           cfg.ln_eps)
            q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
            if "selfbg" in skip:
                # TIMING-ONLY probe: self attention via the bg kernel over
                # the strict prefix (kv_len=pos), WITHOUT the explicit
                # current-token term — tokens are wrong, per-step cost is
                # representative of a kernel-self formulation
                from whisper_tpu.ops.decode_attention import (
                    decode_attention_bg,
                )
                a = decode_attention_bg(q.astype(dtype),
                                        cache_l["k"].astype(dtype),
                                        cache_l["v"].astype(dtype),
                                        pos, block_b=4).astype(dtype)
                h = h + linear(merge_heads(a), lp["attn"]["o"])
            elif "self" not in skip:
                # cache part (strictly past tokens) + explicit self term
                s_c = jnp.einsum("bthd,bhsd->bhts", q,
                                 cache_l["k"].astype(dtype),
                                 preferred_element_type=f32) * (D ** -0.5)
                s_c = jnp.where(strict_mask, s_c, jnp.finfo(f32).min)
                s_s = jnp.einsum("bthd,bhtd->bht", q, k_new.astype(dtype),
                                 preferred_element_type=f32)[..., None] \
                    * (D ** -0.5)                       # (B,H,1,1)
                m = jnp.maximum(jnp.max(s_c, axis=-1, keepdims=True), s_s)
                e_c = jnp.exp(s_c - m)
                e_s = jnp.exp(s_s - m)
                denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_s
                o = jnp.einsum("bhts,bhsd->bthd",
                               (e_c / denom).astype(dtype),
                               cache_l["v"].astype(dtype),
                               preferred_element_type=f32)
                o = o + (e_s / denom).transpose(0, 3, 1, 2) * \
                    v_new.transpose(0, 2, 1, 3).astype(f32)
                a = o.astype(dtype)
                h = r + linear(merge_heads(a), lp["attn"]["o"])
            if "cross" not in skip:
                r = h
                y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"],
                               cfg.ln_eps)
                qx = split_heads(linear(y, lp["cross_attn"]["q"]),
                                 cfg.n_heads)
                a = att_ref(qx, cross_l["k"].astype(dtype),
                            cross_l["v"].astype(dtype))
                h = r + linear(merge_heads(a), lp["cross_attn"]["o"])
            if "mlp" not in skip:
                r = h
                y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"],
                               cfg.ln_eps)
                h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
            return h, (k_new[:, :, 0, :], v_new[:, :, 0, :])

        def att_ref(q, k, v):
            s = jnp.einsum("bthd,bhsd->bhts", q, k,
                           preferred_element_type=f32) * (D ** -0.5)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhts,bhsd->bthd", p.astype(dtype), v,
                              preferred_element_type=f32).astype(dtype)

        h, (k_news, v_news) = jax.lax.scan(
            block, h, (dec["layers"], cache, cross), unroll=True)
        if "append" in skip:
            ck, cv = cache["k"], cache["v"]
        else:
            ck, cv = cache_append_rows(cache["k"], cache["v"], k_news,
                                       v_news, pos)
        if "logits" in skip:
            logits = jnp.broadcast_to(
                jnp.sum(h, axis=-1, keepdims=True), h.shape[:2] + (8,)
            ).astype(f32)
        else:
            logits = final_logits(params, cfg, h)
        return logits, {"k": ck, "v": cv}

    def make_inplace(skip: frozenset = frozenset()):
        def make(n):
            cross, cache0, tokens0, logits0 = pre_f
            first = jnp.argmax(logits0[:, -1, :], axis=-1).astype(jnp.int32)
            tokens0 = tokens0.at[:, P].set(first)

            def body(params, cross, carry, i):
                tokens, cache = carry
                last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
                logits, cache = step_inplace(params, cfg, last, P + i,
                                             cache, cross, skip)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1
                                 ).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, P + i + 1))
                return (tokens, cache), ()

            @jax.jit
            def run(params, cross, tokens, cache):
                carry = (tokens, cache)
                carry, _ = jax.lax.scan(
                    lambda c, i: body(params, cross, c, i), carry,
                    jnp.arange(n, dtype=jnp.int32))
                return carry[0]

            return lambda: run(params, cross, tokens0, cache0)
        return make

    def make_abl(skip: frozenset):
        def make(n):
            cross, cache0, tokens0, logits0 = pre_t
            first = jnp.argmax(logits0[:, -1, :], axis=-1).astype(jnp.int32)
            tokens0 = tokens0.at[:, P].set(first)

            def body(params, cross, carry, i):
                tokens, cache = carry
                last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
                logits, cache = step_abl(params, cfg, last, P + i, cache,
                                         cross, skip)
                nxt = jnp.argmax(logits[:, -1, :], axis=-1
                                 ).astype(jnp.int32)
                tokens = jax.lax.dynamic_update_slice(
                    tokens, nxt[:, None], (0, P + i + 1))
                return (tokens, cache), ()

            @jax.jit
            def run(params, cross, tokens, cache):
                carry = (tokens, cache)
                carry, _ = jax.lax.scan(
                    lambda c, i: body(params, cross, c, i), carry,
                    jnp.arange(n, dtype=jnp.int32))
                return carry[0]

            return lambda: run(params, cross, tokens0, cache0)
        return make

    variants = {
        "prod": lambda: prod_call(pre_t, bias, True),
        "prod_nobias": lambda: prod_call(pre_t, None, True),
        "prod_fwd": lambda: prod_call(pre_f, bias, False),
        # decoder_forward routed to the Pallas batched-heads decode kernel
        # for BOTH self (S=448, valid-prefix streaming) and cross (S=1500)
        "prod_fwd_pallas": lambda: prod_call(
            pre_f, bias, False, cfg.replace(attn_backend="pallas")),
        "scan_t": lambda: make_scan("t", False),
        "scan_t_pick": lambda: make_scan("t", True),
        "scan_fwd": lambda: make_scan("fwd", False),
        "abl_none": lambda: make_abl(frozenset()),
        "abl_self": lambda: make_abl(frozenset({"self"})),
        "abl_cross": lambda: make_abl(frozenset({"cross"})),
        "abl_mlp": lambda: make_abl(frozenset({"mlp"})),
        "abl_logits": lambda: make_abl(frozenset({"logits"})),
        "abl_noappend": lambda: make_abl(frozenset({"append"})),
        "abl_flat": make_flat,
        "abl_inplace": make_inplace,
        "abl_ip_nocross": lambda: make_inplace(frozenset({"cross"})),
        "abl_ip_noself": lambda: make_inplace(frozenset({"self"})),
        "abl_ip_nologits": lambda: make_inplace(frozenset({"logits"})),
        "abl_ip_nomlp": lambda: make_inplace(frozenset({"mlp"})),
        "abl_ip_noappend": lambda: make_inplace(frozenset({"append"})),
        "abl_ip_selfbg": lambda: make_inplace(frozenset({"selfbg"})),
    }
    for v in args.variants.split(","):
        us, fixed = slope(variants[v]())
        print(json.dumps({"variant": v, "batch": B, "us_per_step": us,
                          "fixed_ms": fixed}), flush=True)


if __name__ == "__main__":
    main()
