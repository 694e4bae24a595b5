"""Phase decomposition of the e2e transcription pipeline on the real TPU.

Round-2 finding (fused_step_ab.py): the clean chained decode step costs
311 us at tiny bf16 b8 — i.e. the 89-step decode loop is ~28 ms of an
~114 ms e2e clip batch. This harness times every phase separately so the
remaining ~75% is attributed instead of guessed:

    mel        log-mel frontend (device STFT matmul)
    encoder    conv stem + 4 transformer layers
    cross_kv   per-layer cross-attention K/V precompute
    prefill    decoder_forward over the 4-token prompt
    logits     one tied-vocab projection (B, 1, V)
    step       one incremental decode step incl. logits+argmax (scan chain)
    greedy     full greedy_decode call (prefill + 89-token loop)
    e2e        mel+encoder+greedy in ONE jit (bench.py's program)

Timing: each phase runs N chained iterations inside one jit (the output
feeds the next input through a numerically-negligible but un-CSE-able
carry), two chain lengths cancel the ~30 ms axon dispatch cost. The
`e2e`/`greedy` rows also report a single-dispatch wall (what bench.py
sees, including the tunnel's fixed cost) so dispatch overhead is visible
as the difference.

Usage: python benchmarks/phases.py [--batch 8] [--iters 32] [--out file]
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

from whisper_tpu.audio import log_mel_spectrogram
from whisper_tpu.config import get_config
from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    final_logits,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
from whisper_tpu.tokenizer import build_prompt
from whisper_tpu.weights import to_device

GEN_TOKENS = 89


def chain_time(make_body, iters: int) -> float:
    """Median wall of N chained body() calls inside one jit, slope-corrected
    with a short chain to cancel fixed dispatch cost. make_body() returns
    (x0, body) where body(x, c) -> (x_next, c_next); c is a scalar carry
    that makes iterations data-dependent (so XLA cannot CSE/hoist) while
    perturbing nothing numerically."""

    def runner(n):
        x0, body = make_body()

        @jax.jit
        def run(x):
            def f(carry, _):
                x, c = carry
                return body(x, c), ()
            (xn, cn), _ = jax.lax.scan(f, (x, jnp.float32(0)), None, length=n)
            return cn
        return run, x0

    def wall(n):
        run, x0 = runner(n)
        run(x0).block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            run(x0).block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    return max(wall(iters) - wall(iters // 4), 0.0) / (iters - iters // 4)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=32)
    p.add_argument("--model", default="tiny")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--attn", default=None,
                   help="attn backend override (reference|pallas|auto)")
    p.add_argument("--phases", default=None,
                   help="comma list to run (default: all)")
    p.add_argument("--serving-defaults", action="store_true",
                   help="apply_serving_quant(cfg, batch) + wq weights — "
                        "phase walls at the shipped policy")
    p.add_argument("--out", default=None)
    args = p.parse_args()
    B = args.batch
    only = set(args.phases.split(",")) if args.phases else None

    cfg = get_config(args.model).replace(compute_dtype=args.dtype,
                                         attn_backend=args.attn)
    if args.serving_defaults:
        from whisper_tpu.config import apply_serving_quant
        cfg = apply_serving_quant(cfg, batch=B)
        print(json.dumps({"serving_defaults": True,
                          "wq": cfg.weight_quant, "cq": cfg.cross_kv_quant,
                          "sq": cfg.self_kv_quant,
                          "i8k": cfg.encoder_mlp_quant,
                          "i8q": cfg.encoder_qkv_quant}), flush=True)
    dtype = jnp.dtype(args.dtype)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if args.dtype != "float32":
        params = to_device(params, dtype)
    if cfg.weight_quant:
        from whisper_tpu.models.whisper import quantize_weights_wq
        params = quantize_weights_wq(params, cfg)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    rng = np.random.RandomState(0)
    audio = jnp.asarray((rng.randn(B, cfg.n_samples) * 0.1
                         ).astype(np.float32))
    mel = log_mel_spectrogram(audio, cfg)
    enc = encoder_forward(params, cfg, mel)
    cross = precompute_cross_kv(params, cfg, enc)
    h = jax.random.normal(jax.random.PRNGKey(2), (B, 1, cfg.d_model), dtype)

    def eps(c):
        # data-dependent, numerically absorbed perturbation
        return (c * 1e-30).astype(jnp.float32)

    rows = []

    def report(name, seconds, note=""):
        row = {"phase": name, "batch": B,
               "us": round(seconds * 1e6, 1)}
        if note:
            row["note"] = note
        rows.append(row)
        print(json.dumps(row), flush=True)

    def want(name):
        return only is None or name in only

    # ---- mel ----
    def mk_mel():
        def body(x, c):
            m = log_mel_spectrogram(x + eps(c), cfg)
            return x, jnp.mean(m[0, 0, :8]).astype(jnp.float32)
        return audio, body
    if want("mel"):
        report("mel", chain_time(mk_mel, args.iters))

    # ---- encoder ----
    def mk_enc():
        def body(x, c):
            e = encoder_forward(params, cfg, x + eps(c))
            return x, e[0, 0, 0].astype(jnp.float32)
        return mel, body
    if want("encoder"):
        report("encoder", chain_time(mk_enc, args.iters))

    # ---- encoder sub-phases: conv stem / one transformer layer / attn ----
    def mk_enc_conv():
        from whisper_tpu.models.whisper import conv_stem

        ep = params["encoder"]

        def body(x, c):
            y = conv_stem(ep, cfg, x + eps(c))
            return x, y[0, 0, 0].astype(jnp.float32)
        return mel, body
    if want("enc_conv"):
        import os as _os
        report("enc_conv", chain_time(mk_enc_conv, args.iters),
               note=f"stem={_os.environ.get('WHISPER_TPU_CONV_STEM', 'conv')}")

    def mk_enc_attn():
        from whisper_tpu.ops.attention import multi_head_attention

        q0 = jax.random.normal(jax.random.PRNGKey(3),
                               (B, cfg.n_audio_ctx, cfg.n_heads,
                                cfg.d_model // cfg.n_heads), dtype)
        k0 = jnp.swapaxes(q0, 1, 2)

        def body(x, c):
            a = multi_head_attention(x + eps(c).astype(dtype), k0, k0,
                                     backend=cfg.attn_backend)
            return x, a[0, 0, 0, 0].astype(jnp.float32)
        return q0, body
    if want("enc_attn"):
        report("enc_attn", chain_time(mk_enc_attn, args.iters),
               note=f"one S={cfg.n_audio_ctx} self-attn, "
                    f"backend={cfg.attn_backend or 'auto'}")

    # ---- one full encoder transformer block (r3: attribute the ~3 ms of
    # non-attention encoder time) ----
    def _block_parts():
        from whisper_tpu.models.whisper import (
            gelu, layer_norm, linear, merge_heads, qkv_fused)
        from whisper_tpu.ops.attention import multi_head_attention
        lp = jax.tree.map(lambda a: a[0], params["encoder"]["layers"])
        x0 = jax.random.normal(jax.random.PRNGKey(5),
                               (B, cfg.n_audio_ctx, cfg.d_model), dtype)
        return lp, x0, gelu, layer_norm, linear, merge_heads, qkv_fused, \
            multi_head_attention

    def mk_enc_layer():
        (lp, x0, gelu, layer_norm, linear, merge_heads, qkv_fused,
         mha) = _block_parts()

        def body(x, c):
            h = x + eps(c).astype(dtype)
            r = h
            y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"],
                           cfg.ln_eps)
            q, k, v = qkv_fused(y, lp["attn"], cfg.n_heads)
            a = merge_heads(mha(q, k, v, backend=cfg.attn_backend))
            h = r + linear(a, lp["attn"]["o"])
            r = h
            y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"],
                           cfg.ln_eps)
            y = linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
            return x, (r + y)[0, 0, 0].astype(jnp.float32)
        return x0, body
    if want("enc_layer"):
        report("enc_layer", chain_time(mk_enc_layer, args.iters),
               note="one full transformer block")

    def mk_enc_qkv():
        """LN1 + fused QKV projection (the part staying in XLA under the
        fused-tail design)."""
        (lp, x0, gelu, layer_norm, linear, merge_heads, qkv_fused,
         mha) = _block_parts()

        def body(x, c):
            y = layer_norm(x + eps(c).astype(dtype), lp["attn_ln"]["g"],
                           lp["attn_ln"]["b"], cfg.ln_eps)
            q, k, v = qkv_fused(y, lp["attn"], cfg.n_heads)
            return x, q[0, 0, 0, 0].astype(jnp.float32)
        return x0, body
    if want("enc_qkv"):
        report("enc_qkv", chain_time(mk_enc_qkv, args.iters),
               note="LN1 + fused qkv matmul")

    def mk_enc_tail():
        """attention + o-proj + residual + LN2 + MLP + residual — the scope
        of the fused encoder-tail kernel (ops/encoder_layer.py), in XLA."""
        (lp, x0, gelu, layer_norm, linear, merge_heads, qkv_fused,
         mha) = _block_parts()
        Dh = cfg.d_model // cfg.n_heads
        q0 = jax.random.normal(jax.random.PRNGKey(6),
                               (B, cfg.n_audio_ctx, cfg.n_heads, Dh), dtype)
        k0 = jnp.swapaxes(q0, 1, 2)

        def body(x, c):
            h = x + eps(c).astype(dtype)
            a = merge_heads(mha(q0, k0, k0, backend=cfg.attn_backend))
            h2 = h + linear(a, lp["attn"]["o"])
            y = layer_norm(h2, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"],
                           cfg.ln_eps)
            y = linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
            return x, (h2 + y)[0, 0, 0].astype(jnp.float32)
        return x0, body
    if want("enc_tail"):
        report("enc_tail", chain_time(mk_enc_tail, args.iters),
               note="attn+o+LN2+MLP (fused-kernel scope), XLA baseline")

    # ---- cross-kv precompute ----
    def mk_cross():
        def body(x, c):
            kv = precompute_cross_kv(params, cfg, x + eps(c).astype(x.dtype))
            return x, kv["k"][0, 0, 0, 0, 0].astype(jnp.float32)
        return enc, body
    if want("cross_kv"):
        report("cross_kv", chain_time(mk_cross, args.iters))

    # ---- prefill (4-token decoder forward, fresh cache) ----
    def mk_prefill():
        cache0 = init_kv_cache(cfg, B, dtype=dtype)

        def body(x, c):
            x2 = jax.tree.map(lambda a: a + eps(c).astype(a.dtype), x)
            logits, _ = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                        cache0, x2)
            return x, logits[0, -1, 0].astype(jnp.float32)
        return cross, body
    if want("prefill"):
        report("prefill", chain_time(mk_prefill, args.iters),
               note="cross kv reused; cache write discarded")

    # ---- logits projection ----
    def mk_logits():
        def body(x, c):
            l = final_logits(params, cfg, x + eps(c).astype(x.dtype))
            return x, l[0, 0, 0].astype(jnp.float32)
        return h, body
    if want("logits"):
        report("logits", chain_time(mk_logits, args.iters))

    # ---- full greedy (single dispatch, wall + two-length slope) ----
    def make_greedy(n_tokens):
        @jax.jit
        def greedy(p_, e_, pr_):
            bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
            bias = bias.at[cfg.eot_token].set(-1e9)
            return greedy_decode(p_, cfg, e_, pr_, max_new=n_tokens - 1,
                                 logit_bias=bias)
        return greedy

    def greedy_wall(n_tokens):
        g = make_greedy(n_tokens)
        g(params, enc, prompt).tokens.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            g(params, enc, prompt).tokens.block_until_ready()
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    if want("greedy"):
        g_long = greedy_wall(GEN_TOKENS)
        g_short = greedy_wall(GEN_TOKENS // 4)
        slope = (g_long - g_short) / (GEN_TOKENS - GEN_TOKENS // 4)
        report("greedy_wall", g_long,
               note=f"{GEN_TOKENS} tokens single dispatch; while_loop "
               f"per-step slope {slope * 1e6:.0f}us; fixed (prefill+"
               f"dispatch) {(g_long - slope * GEN_TOKENS) * 1e3:.1f}ms")

    # ---- e2e (bench.py's program, single dispatch) ----
    @jax.jit
    def e2e(p_, a_, pr_):
        m = log_mel_spectrogram(a_, cfg)
        e_ = encoder_forward(p_, cfg, m)
        bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
        bias = bias.at[cfg.eot_token].set(-1e9)
        return greedy_decode(p_, cfg, e_, pr_, max_new=GEN_TOKENS - 1,
                             logit_bias=bias)

    if want("e2e"):
        e2e(params, audio, prompt).tokens.block_until_ready()
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            e2e(params, audio, prompt).tokens.block_until_ready()
            ts.append(time.perf_counter() - t0)
        report("e2e_wall", float(np.median(ts)),
               note=f"rtfx={B * cfg.chunk_length_s / float(np.median(ts)):.0f}")

    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
