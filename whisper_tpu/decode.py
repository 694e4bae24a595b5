"""Decoding strategies: greedy, temperature sampling, beam search — all
jitted, batched, fully on-device.

Replaces the reference's host-side transcribe loop (whisper.mojo:170-223):
seed prompt -> prefill -> argmax -> per-token loop capped at 195 steps,
stopping on EOT and *including* the EOT token in the output
(whisper.mojo:205-221). The reference supports exactly greedy; sampling and
beam search are capability extensions following openai/whisper's
DecodingTask semantics (see decode_rules.py for the logit rules).

TPU-first design: each strategy is one `lax.while_loop` inside one jit —
tokens, KV cache, and logits never leave the device, so there is no
host<->device sync per token (the single biggest latency lever at batch 1).
Batched: each sequence carries a `finished` flag; finished rows keep emitting
EOT (padding) while the loop runs until all rows finish or the cap hits —
this reproduces the reference's break-at-EOT semantics per row. Beam search
keeps the beam dim folded into batch for the decoder, reordering the KV
cache with a gather on every beam hop.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode_rules import NEG, DecodeOptions, apply_rules
from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    final_logits,
    init_kv_cache,
    precompute_cross_kv,
)


def _fused_step_enabled(cfg: WhisperConfig) -> bool:
    """Whether greedy decode uses the fused decoder-step megakernel
    (ops/decoder_step.py). Auto policy: OFF — measured on the real v5e
    (tiny bf16 b8) the megakernel runs 591 us/step vs the XLA step's 311
    in the clean chained harness (DESIGN.md §10: XLA is already ~1.4x the
    HBM floor, leaving no room to repay a fusion boundary), so it stays
    opt-in as the weight-resident-decode platform for larger models.
    WHISPER_TPU_FUSED=0|1 overrides; cfg.fused_step forces (True off-TPU
    runs the kernel in interpret mode — tests).

    Set WHISPER_TPU_FUSED (and WHISPER_TPU_SPLIT_DECODE) BEFORE the first
    decode call of the process: both are read at trace time, and the jit
    cache keys on shapes/statics only, so a mid-process flip is silently
    ignored for already-traced configs (same caveat as flash_attention's
    _env_block)."""
    import os
    if cfg.kv_cache_quant or cfg.cross_kv_quant or cfg.weight_quant:
        # the megakernel packs raw bf16 weight tensors (ops/decoder_step.py
        # pack_decoder_weights) — int8 weight-quantized trees take the XLA
        # step, whose in-graph dequant is the measured-winning form (§28)
        return False
    env = os.environ.get("WHISPER_TPU_FUSED")
    if env is not None:
        return env == "1"
    if cfg.fused_step is not None:
        return cfg.fused_step
    return False


def _make_fused_step(params, cfg: WhisperConfig, cache, cross_kv):
    """Build the fused-step closure + convert the cache/cross K/V to the
    kernel's head-outer layout (once per transcription, after prefill).

    Returns (step_fn, converted_cache) where
    step_fn(last_tokens (B,1), pos, cache) -> (logits (B,1,V), cache)."""
    from whisper_tpu.ops.decoder_step import (
        fused_decoder_step,
        pack_misc,
        split_weights,
        to_head_outer,
    )
    dec = params["decoder"]
    layers = dec["layers"]
    dtype = jnp.dtype(cfg.compute_dtype)
    wqkv, wcq, wo, wco = split_weights(layers, cfg.n_heads, dtype)
    fc1_w = layers["fc1"]["w"].astype(dtype)
    fc2_w = layers["fc2"]["w"].astype(dtype)
    qkvb, fc1b, miscp, miscd = pack_misc(layers, cfg.n_heads)
    cache = {"k": to_head_outer(cache["k"]), "v": to_head_outer(cache["v"])}
    cross_k = to_head_outer(cross_kv["k"])
    cross_v = to_head_outer(cross_kv["v"])
    interpret = (jax.default_backend() != "tpu"
                 or cfg.attn_backend == "pallas_interpret")
    import os
    block_cross = int(os.environ.get("WHISPER_TPU_FUSED_BLOCK_CROSS", "0"))
    # weight-block knobs read HERE (eager, once per transcription) so env
    # changes take effect — fused_decoder_step is jitted and only sees them
    # as static args (mid-process env flips would otherwise hit its cache)
    block_qkv = int(os.environ.get("WHISPER_TPU_FUSED_BLKQ", "0"))
    block_mlp = int(os.environ.get("WHISPER_TPU_FUSED_BLKM", "0"))
    w_budget = int(os.environ.get("WHISPER_TPU_FUSED_WBUDGET",
                                  str(8 * 1024 * 1024)))

    def step(last, pos, cache):
        h0 = (dec["tok_emb"][last[:, 0]].astype(dtype)
              + dec["pos_emb"][pos][None, :].astype(dtype))
        h_out, k_new, v_new = fused_decoder_step(
            h0, wqkv, wcq, wo, wco, fc1_w, fc2_w, qkvb, fc1b, miscp, miscd,
            cache["k"], cache["v"], cross_k, cross_v, pos + 1,
            n_layers=cfg.n_text_layers, n_heads=cfg.n_heads,
            eps=cfg.ln_eps, interpret=interpret, block_cross=block_cross,
            block_qkv=block_qkv, block_mlp=block_mlp, w_budget=w_budget)
        cache = {
            "k": jax.lax.dynamic_update_slice(
                cache["k"], k_new[:, :, None, :], (0, 0, pos, 0)),
            "v": jax.lax.dynamic_update_slice(
                cache["v"], v_new[:, :, None, :], (0, 0, pos, 0)),
        }
        return final_logits(params, cfg, h_out[:, None, :]), cache

    return step, cache


# Steps per counted scan inside the early-exit while wrapper (see the
# chunked-schedule comment in greedy_decode); env-overridable for A/B.
# Default 1 = the plain early-exit while: 16-step chunks measured faster in
# an isolated loop program (542 vs 609 us/step) but slower inside the e2e
# program (b8 94.8 vs 87.8 ms) — XLA's scheduling of the nested scan flips
# sign with the surrounding graph, so the simple schedule is the default
# and chunking stays an A/B knob.
_DECODE_CHUNK = int(os.environ.get("WHISPER_TPU_DECODE_CHUNK", "1"))


class DecodeResult(NamedTuple):
    tokens: jax.Array    # (B, prompt_len + 1 + max_new) int32, EOT-padded
    lengths: jax.Array   # (B,) int32 — total valid tokens incl. prompt + EOT
    sum_logprobs: Optional[jax.Array] = None   # (B,) — chosen-token logprobs
    no_speech_prob: Optional[jax.Array] = None  # (B,) — P(<|nospeech|>) @ SOT

    def avg_logprob(self, prompt_len: int) -> jax.Array:
        """Mean chosen-token logprob over generated tokens (incl. EOT) —
        the quality signal the temperature-fallback protocol thresholds."""
        n = jnp.maximum(self.lengths - prompt_len, 1).astype(jnp.float32)
        return self.sum_logprobs / n


def _lengths(tokens: jax.Array, P: int, eot) -> jax.Array:
    """Valid length = up to and including the first EOT in the generated
    region (or the full buffer if none)."""
    gen = tokens[..., P:]
    is_eot = gen == eot
    any_eot = jnp.any(is_eot, axis=-1)
    first_eot = jnp.argmax(is_eot, axis=-1)
    gen_len = jnp.where(any_eot, first_eot + 1, gen.shape[-1])
    return (P + gen_len).astype(jnp.int32)


def _loop_step_mode(cfg: WhisperConfig) -> str:
    """Which loop-local step formulation greedy decode uses when the loop
    compiles as its own program (use_t=True):

      * 'ip' — decoder_step_ip: standard cache layout, read-only cache
        attention + ONE aliased in-place Pallas append per step. The bf16
        serving default: measured 1370 → 773 µs/step at tiny b32
        (benchmarks/loop_bisect.py; the XLA append rewrite was ~780 µs of
        the step).
      * 't'  — decoder_step_t: transposed loop-local cache. The fp32
        default: its dots are byte-stable against mha_reference (the
        token-parity contract), which step_ip's two-part softmax
        regrouping is not (argmax-equal but not bit-equal).

    WHISPER_TPU_LOOP_STEP=ip|t overrides (trace-time, same set-before-
    first-call caveat as _fused_step_enabled)."""
    env = os.environ.get("WHISPER_TPU_LOOP_STEP")
    if env in ("ip", "t"):
        return env
    return "t" if jnp.dtype(cfg.compute_dtype) == jnp.float32 else "ip"


def _cache_slots(cfg: WhisperConfig, total: int) -> int:
    """Self-cache slot count for a decode capped at `total` positions:
    the step's self-attention reads every allocated slot (masked ones
    included — XLA cannot skip them), so allocate only what this call can
    reach, rounded to 64 for layout friendliness. The fused megakernel
    keeps the full-context cache (its weight-streaming blocks were tuned
    at n_text_ctx). Masked slots contribute exp(-inf) == 0.0 exactly, so
    results are bit-identical to the full-size cache."""
    if _fused_step_enabled(cfg):
        return cfg.n_text_ctx
    return min(cfg.n_text_ctx, -(-total // 64) * 64)


def _greedy_prefill(params, cfg: WhisperConfig, enc_out, prompt, total: int,
                    use_t: bool = True):
    """Stage 1: cross-K/V precompute + prompt prefill (whisper.mojo:195-197).
    Returns (cross_kv, cache, tokens, prefill_logits). use_t enables the
    loop-local step formulations (_loop_step_mode) — a win only when the
    loop compiles as its own program (DESIGN.md §13), so the inline path
    passes False. Only mode 't' changes the cache layout here; mode 'ip'
    keeps the standard layout."""
    B, P = prompt.shape
    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    cache = init_kv_cache(cfg, B, dtype=jnp.dtype(cfg.compute_dtype),
                          s_max=_cache_slots(cfg, total))
    tokens = jnp.full((B, total), jnp.int32(cfg.eot_token), dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    logits, cache = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                    cache, cross_kv)
    if use_t and "k_s" not in cache and not _fused_step_enabled(cfg) \
            and _loop_step_mode(cfg) == "t":
        from whisper_tpu.models.whisper import transpose_self_cache
        cache = transpose_self_cache(cache)
    return cross_kv, cache, tokens, logits


def _greedy_loop(params, cfg: WhisperConfig, cross_kv, cache, tokens,
                 prefill_logits, prompt, logit_bias, rng,
                 opts: Optional[DecodeOptions], max_new: int,
                 use_t: bool = True) -> DecodeResult:
    """Stage 2: first-token pick + the incremental decode loop. use_t must
    match the _greedy_prefill that produced `cache`."""
    B, P = prompt.shape
    eot = jnp.int32(cfg.eot_token)
    temperature = float(opts.temperature) if opts is not None else 0.0

    def pick(logits, tokens, pos, key):
        """logits (B, T, V) -> (next token (B,), its logprob (B,))."""
        l = logits[:, -1, :]
        if logit_bias is not None:
            l = l + logit_bias[None, :]
        if opts is not None:
            l = apply_rules(l, tokens, pos, P, cfg, opts)
        if temperature > 0:
            nxt = jax.random.categorical(key, l / temperature, axis=-1
                                         ).astype(jnp.int32)
        else:
            nxt = jnp.argmax(l, axis=-1).astype(jnp.int32)
        logp = jax.nn.log_softmax(l.astype(jnp.float32), axis=-1)
        chosen = jnp.take_along_axis(logp, nxt[:, None], axis=-1)[:, 0]
        return nxt, chosen

    logits = prefill_logits
    rng, key = jax.random.split(rng)
    first, lp0 = pick(logits, tokens, jnp.int32(P), key)
    tokens = tokens.at[:, P].set(first)
    finished0 = first == eot

    # openai/whisper no-speech signal: P(<|nospeech|>) at the SOT position
    # of the prefill (SOT may be offset by a <|startofprev|> prefix).
    sot_idx = jnp.argmax(prompt == jnp.int32(cfg.sot_token), axis=1)  # (B,)
    sot_logits = jnp.take_along_axis(
        logits, sot_idx[:, None, None], axis=1)[:, 0, :]
    no_speech_prob = jax.nn.softmax(sot_logits.astype(jnp.float32), axis=-1
                                    )[:, cfg.no_speech_token]

    # Incremental step: the fused Pallas megakernel when eligible (one
    # program for all decoder layers, ops/decoder_step.py), else one of the
    # loop-local formulations per _loop_step_mode — decoder_step_ip
    # (in-place Pallas append, bf16 serving default) or decoder_step_t
    # (transposed cache, fp32 token-parity default); quantized self-caches
    # keep the standard decoder_forward path. All share prefill above and
    # logits/rules below.
    # self_kv_quant (commuted int8 self cache, DESIGN.md §35) is an
    # ip-step-only formulation: it keeps the standard layout and must not
    # route through the fused megakernel or the transposed-'t' step
    q8_self = "k_s" in cache and not cfg.kv_cache_quant
    if _fused_step_enabled(cfg) and not q8_self:
        step_fn, cache = _make_fused_step(params, cfg, cache, cross_kv)
    elif use_t and not cfg.kv_cache_quant:
        if _loop_step_mode(cfg) == "ip" or q8_self:
            from whisper_tpu.models.whisper import decoder_step_ip

            def step_fn(last, pos, cache):
                return decoder_step_ip(params, cfg, last, pos, cache,
                                       cross_kv)
        else:
            from whisper_tpu.models.whisper import decoder_step_t

            def step_fn(last, pos, cache):
                return decoder_step_t(params, cfg, last, pos, cache,
                                      cross_kv)
    else:
        def step_fn(last, pos, cache):
            return decoder_forward(params, cfg, last, pos, cache, cross_kv)

    # ---- incremental loop (whisper.mojo:205-221) ----
    # Chunked schedule: a counted lax.scan of _DECODE_CHUNK steps inside
    # each while iteration. Measured on v5e (benchmarks/phases.py, tiny
    # bf16 b8): a bare while_loop decodes at 609 us/step while the
    # identical math in a counted scan runs at 311 us/step — the
    # non-trivial while condition (all(finished)) serializes iterations,
    # whereas the static trip count pipelines. The while wrapper keeps the
    # reference's early-exit semantics (whisper.mojo:207) at chunk
    # granularity; overshoot steps within a chunk are masked (finished
    # rows re-emit EOT, sum_lp frozen, i >= max_new writes suppressed), so
    # tokens/lengths/logprobs are identical to the step-wise loop.
    def step_once(carry, _):
        i, tokens, cache, finished, sum_lp, rng = carry
        last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
        logits, cache = step_fn(last, P + i, cache)
        rng, key = jax.random.split(rng)
        picked, lp = pick(logits, tokens, P + i + 1, key)
        live = jnp.logical_and(jnp.logical_not(finished), i < max_new)
        nxt = jnp.where(live, picked, eot)
        sum_lp = sum_lp + jnp.where(live, lp, 0.0)
        # masked write: overshoot past max_new clamps col onto the final
        # column, so out-of-bounds steps must not write at all (they would
        # overwrite the last real token with the EOT padding)
        col = jnp.minimum(P + i + 1, tokens.shape[1] - 1)
        inb = P + i + 1 < tokens.shape[1]
        write = jnp.logical_and(jnp.logical_or(live, finished), inb)
        cur = tokens[jnp.arange(B), col]
        tokens = tokens.at[jnp.arange(B), col].set(
            jnp.where(write, nxt, cur))
        finished = jnp.logical_or(finished, nxt == eot)
        return (i + 1, tokens, cache, finished, sum_lp, rng), ()

    def cond(state):
        i, _, _, finished, _, _ = state
        return jnp.logical_and(i < max_new, jnp.logical_not(jnp.all(finished)))

    def chunk(state):
        state, _ = jax.lax.scan(step_once, state, None,
                                length=min(_DECODE_CHUNK, max_new))
        return state

    state0 = (jnp.int32(0), tokens, cache, finished0, lp0, rng)
    if _DECODE_CHUNK <= 0:
        # pure counted scan, no early exit (A/B instrumentation)
        state, _ = jax.lax.scan(step_once, state0, None, length=max_new)
        _, tokens, _, _, sum_lp, _ = state
    else:
        _, tokens, _, _, sum_lp, _ = jax.lax.while_loop(cond, chunk, state0)

    return DecodeResult(tokens=tokens, lengths=_lengths(tokens, P, eot),
                        sum_logprobs=sum_lp, no_speech_prob=no_speech_prob)


_jit_greedy_prefill = functools.partial(
    jax.jit, static_argnames=("cfg", "total", "use_t"))(_greedy_prefill)
_jit_greedy_loop = functools.partial(
    jax.jit, static_argnames=("cfg", "opts", "max_new", "use_t"))(_greedy_loop)


def _split_decode_enabled() -> bool:
    """Whether eager decode dispatches split (prefill | loop) programs.
    Split is the right default where dispatch is cheap (direct-attached
    devices, CPU); WHISPER_TPU_SPLIT_DECODE=0 selects the single-program
    path for hosts where each dispatch carries fixed cost (e.g. ~30 ms
    through the axon tunnel, where the extra dispatch outweighs the
    faster-compiling loop — DESIGN.md §13)."""
    return os.environ.get("WHISPER_TPU_SPLIT_DECODE", "1") == "1"


@functools.partial(jax.jit, static_argnames=("cfg", "opts", "max_new",
                                             "total"))
def _greedy_onejit(params, cfg, enc_out, prompt, logit_bias, rng, opts,
                   max_new, total):
    pre = _greedy_prefill(params, cfg, enc_out, prompt, total, use_t=False)
    return _greedy_loop(params, cfg, *pre, prompt, logit_bias, rng,
                        opts=opts, max_new=max_new, use_t=False)


def greedy_decode(params, cfg: WhisperConfig, enc_out: jax.Array,
                  prompt: jax.Array,
                  max_new: Optional[int] = None,
                  logit_bias: Optional[jax.Array] = None,
                  opts: Optional[DecodeOptions] = None,
                  rng: Optional[jax.Array] = None) -> DecodeResult:
    """Greedy (or, with opts.temperature > 0 and an rng key, sampled) decode
    against a computed encoder output.

    Called EAGERLY (not under an enclosing jit), this dispatches two
    separately-jitted stages — prefill and the decode loop. Measured on v5e
    (tiny bf16 b8, DESIGN.md §13): compiling the loop in its own program
    cuts the per-step cost 557 -> 375 us (XLA schedules/allocates the loop
    dramatically better without the mel/encoder/prefill graph around it).
    On hosts where every dispatch carries a fixed cost (~30 ms through the
    axon tunnel), the extra dispatch can outweigh the loop savings —
    WHISPER_TPU_SPLIT_DECODE=0 selects a single-program eager path. Under
    an enclosing trace the stages always inline into one program.

    Args:
      enc_out: (B, n_audio_ctx, d_model).
      prompt: (B, P) int32 SOT sequence (P static).
      max_new: cap on loop tokens after the prefill argmax (reference: 195).
      logit_bias: optional (vocab,) additive bias applied before argmax
        (raw hook; prefer `opts` for the standard rule stack).
      opts: static DecodeOptions — suppression/timestamp rules, temperature.
      rng: PRNG key, required iff opts.temperature > 0.
    """
    if max_new is None:
        max_new = cfg.max_new_tokens
    total = prompt.shape[1] + 1 + max_new
    temperature = float(opts.temperature) if opts is not None else 0.0
    if temperature > 0 and rng is None:
        raise ValueError("temperature sampling needs an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)

    eager = not isinstance(enc_out, jax.core.Tracer)
    if eager and not _split_decode_enabled():
        return _greedy_onejit(params, cfg, enc_out, prompt, logit_bias, rng,
                              opts=opts, max_new=max_new, total=total)
    prefill = _jit_greedy_prefill if eager else _greedy_prefill
    loop = _jit_greedy_loop if eager else _greedy_loop
    # decoder_step_t only wins when the loop compiles as its own program
    # (DESIGN.md §13); inline (traced) callers keep decoder_forward
    cross_kv, cache, tokens, logits = prefill(params, cfg, enc_out, prompt,
                                              total=total, use_t=eager)
    return loop(params, cfg, cross_kv, cache, tokens, logits, prompt,
                logit_bias, rng, opts=opts, max_new=max_new, use_t=eager)


def _beam_gather_cache(cache, flat_src: jax.Array, kv_len, s_axis: int):
    """Reorder KV-cache rows to follow their source beams, touching ONLY
    the valid prefix (VERDICT r2 weak #5: the naive full gather moved all
    448 padded slots every hop — ~2x 55 MB at tiny beam-5 b8 though only
    kv_len columns hold history).

    The S axis is walked in fixed blocks with a `fori_loop` bounded by
    cdiv(kv_len, block): each iteration slices a block (small temp),
    permutes its rows, and writes it back in place — XLA keeps the cache
    buffer aliased through the loop carry, so per-hop traffic is
    ~2 * kv_len/S of the old cost. Columns past kv_len keep stale
    (un-gathered) rows, which is sound: every future step WRITES its
    column before reading it, and the (kv_len, causal) mask hides the
    rest — the same contract the kernels rely on.

    s_axis: index of the S axis (4 for the transposed loop cache
    (L, BW, H, Dh, S); 3 for the standard / quantized layouts)."""
    def one(c):
        S = c.shape[s_axis]
        # block must divide S exactly: a clamped dynamic_slice at the tail
        # would re-gather (double-permute) overlap columns
        block = next((b for b in (128, 64, 32, 16, 8) if S % b == 0), None)
        if block is None or S <= 2 * block:
            return jnp.take(c, flat_src, axis=1)
        nblk = jax.lax.div(jnp.asarray(kv_len, jnp.int32) + (block - 1),
                           jnp.int32(block))

        def body(jb, cc):
            col = jb * block
            piece = jax.lax.dynamic_slice_in_dim(cc, col, block, axis=s_axis)
            piece = jnp.take(piece, flat_src, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(cc, piece, col,
                                                       axis=s_axis)

        return jax.lax.fori_loop(0, nblk, body, c)

    return jax.tree.map(one, cache)


def _beam_prefill(params, cfg: WhisperConfig, enc_out, prompt,
                  beam_size: int, total: int, use_t: bool = True):
    """Stage 1 of beam search: beam-replicated cross K/V + prompt prefill.
    Returns (cross_kv, cache, prefill_logits)."""
    W = beam_size
    B, P = prompt.shape
    # replicate encoder state across beams: (L, B, ...) -> (L, B*W, ...)
    cross_kv = jax.tree.map(
        lambda x: jnp.repeat(x, W, axis=1), precompute_cross_kv(params, cfg, enc_out))
    cache = init_kv_cache(cfg, B * W, dtype=jnp.dtype(cfg.compute_dtype),
                          s_max=_cache_slots(cfg, total))
    prompt_bw = jnp.repeat(prompt, W, axis=0)            # (BW, P)
    logits, cache = decoder_forward(params, cfg, prompt_bw, jnp.int32(0),
                                    cache, cross_kv)
    if use_t and "k_s" not in cache and _loop_step_mode(cfg) == "t":
        # loop-local transposed cache layout (see decoder_step_t); mode
        # 'ip' (decoder_step_ip) keeps the standard layout, as does a
        # quantized self cache (ip-only, DESIGN.md §35)
        from whisper_tpu.models.whisper import transpose_self_cache
        cache = transpose_self_cache(cache)
    return cross_kv, cache, logits


def beam_decode(params, cfg: WhisperConfig, enc_out: jax.Array,
                prompt: jax.Array, beam_size: int = 5,
                max_new: Optional[int] = None,
                opts: Optional[DecodeOptions] = None) -> DecodeResult:
    """Beam-search decode (capability extension; the reference is
    greedy-only). Beams ride the batch dimension through the decoder; on
    every beam hop the KV cache rows are gathered to follow their source
    beams. Finished beams stay in the beam holding EOT at frozen score
    (standard jit-friendly formulation). Final ranking: score / length
    when opts.length_penalty is None, else Google-NMT
    ((5 + len) / 6) ** penalty (matching openai/whisper's ranker).

    Eager calls dispatch two jitted stages (prefill | loop), like
    greedy_decode — see its docstring for the measured why.

    Returns the best beam per batch row.
    """
    if opts is not None and opts.temperature > 0:
        raise ValueError("beam search is deterministic; temperature > 0 is "
                         "incompatible with beam_size > 1 (openai/whisper "
                         "uses best_of sampling instead)")
    if max_new is None:
        max_new = cfg.max_new_tokens
    total = prompt.shape[1] + 1 + max_new
    eager = not isinstance(enc_out, jax.core.Tracer)
    if eager and not _split_decode_enabled():
        return _beam_onejit(params, cfg, enc_out, prompt,
                            beam_size=beam_size, max_new=max_new,
                            opts=opts, total=total)
    prefill = _jit_beam_prefill if eager else _beam_prefill
    loop = _jit_beam_loop if eager else _beam_loop
    cross_kv, cache, logits = prefill(params, cfg, enc_out, prompt,
                                      beam_size=beam_size, total=total,
                                      use_t=eager)
    return loop(params, cfg, cross_kv, cache, logits, prompt,
                beam_size=beam_size, max_new=max_new, opts=opts,
                use_t=eager)


def _beam_loop(params, cfg: WhisperConfig, cross_kv, cache, prefill_logits,
               prompt, beam_size: int, max_new: int,
               opts: Optional[DecodeOptions],
               use_t: bool = True) -> DecodeResult:
    """Stage 2 of beam search: first expansion + beam loop + ranking."""
    B, P = prompt.shape
    W = beam_size
    BW = B * W
    total = P + 1 + max_new
    eot = jnp.int32(cfg.eot_token)
    V = cfg.vocab_size
    logits = prefill_logits

    def rules(l, tokens_flat, pos):
        if opts is not None:
            return apply_rules(l, tokens_flat, pos, P, cfg, opts)
        return l

    q8_self = "k_s" in cache and not cfg.kv_cache_quant
    if use_t and not cfg.kv_cache_quant:
        if _loop_step_mode(cfg) == "ip" or q8_self:
            import os

            from whisper_tpu.models.whisper import decoder_step_ip

            # Measured beam-loop perf default (DESIGN.md §31): beam rows
            # B*W >= 40 already saturate the MXU dot, so the query-tile
            # broadcast only adds HBM traffic — untiled measured FASTER
            # at tiny (1,759 vs 1,685 RTFx b32). Historically this also
            # guarded a real XLA miscompile (kernel fault at
            # wq+cq+tiled+40 rows) — fixed in the current toolchain per
            # benchmarks/repro_beam_fault.py (r4: 3/3 clean); the canary
            # re-checks on every compiler update. WHISPER_TPU_MXU_T set
            # explicitly wins.
            beam_mxu_t = None
            if (cfg.weight_quant and cfg.cross_kv_quant
                    and cfg.d_model < 512
                    and os.environ.get("WHISPER_TPU_MXU_T") is None):
                beam_mxu_t = 0

            def beam_step(last, pos, cache):
                return decoder_step_ip(params, cfg, last, pos, cache,
                                       cross_kv, mxu_t=beam_mxu_t)
        else:
            from whisper_tpu.models.whisper import decoder_step_t

            def beam_step(last, pos, cache):
                return decoder_step_t(params, cfg, last, pos, cache,
                                      cross_kv)
    else:
        def beam_step(last, pos, cache):
            return decoder_forward(params, cfg, last, pos, cache, cross_kv)

    # no-speech signal from the prefill, same SOT-position softmax as
    # greedy_decode (beams are identical at prefill — use beam 0's row)
    sot_idx = jnp.argmax(prompt == jnp.int32(cfg.sot_token), axis=1)  # (B,)
    logits_b0 = logits.reshape(B, W, P, V)[:, 0]                      # (B,P,V)
    sot_logits = jnp.take_along_axis(
        logits_b0, sot_idx[:, None, None], axis=1)[:, 0, :]
    no_speech_prob = jax.nn.softmax(sot_logits.astype(jnp.float32), axis=-1
                                    )[:, cfg.no_speech_token]

    tokens = jnp.full((B, W, total), eot, dtype=jnp.int32)
    tokens = tokens.at[:, :, :P].set(prompt[:, None, :])

    l0 = rules(logits[:, -1, :], tokens.reshape(BW, total), jnp.int32(P))
    logp0 = jax.nn.log_softmax(l0.astype(jnp.float32), axis=-1)
    # beams are identical after prefill: expand beam 0's top-W
    sum_lp, tok0 = jax.lax.top_k(logp0.reshape(B, W, V)[:, 0], W)   # (B, W)
    tokens = tokens.at[:, :, P].set(tok0)
    finished0 = tok0 == eot

    eot_only = jnp.full((V,), NEG, jnp.float32).at[cfg.eot_token].set(0.0)

    def cond(state):
        i, _, _, _, finished = state
        return jnp.logical_and(i < max_new, jnp.logical_not(jnp.all(finished)))

    def step_once(state, _):
        # Chunked like greedy_decode (see its schedule comment): overshoot
        # steps treat every beam as finished (EOT-only extension at zero
        # cost — top_k is stable, so ordering and scores are unchanged) and
        # out-of-bounds writes are suppressed.
        i, tokens, cache, sum_lp, finished = state
        last = jax.lax.dynamic_slice(
            tokens, (0, 0, P + i), (B, W, 1)).reshape(BW, 1)
        logits, cache = beam_step(last, P + i, cache)
        l = rules(logits[:, -1, :], tokens.reshape(BW, total), P + i + 1)
        lp = jax.nn.log_softmax(l.astype(jnp.float32), axis=-1).reshape(B, W, V)
        # finished beams (and all beams past the cap) may only extend with
        # EOT at zero cost
        frozen = jnp.logical_or(finished, i >= max_new)
        lp = jnp.where(frozen[:, :, None], eot_only[None, None, :], lp)
        cand = sum_lp[:, :, None] + lp                   # (B, W, V)
        new_lp, flat_idx = jax.lax.top_k(cand.reshape(B, W * V), W)
        src = flat_idx // V                              # (B, W) source beam
        new_tok = (flat_idx % V).astype(jnp.int32)

        tokens = jnp.take_along_axis(tokens, src[:, :, None], axis=1)
        col = jnp.minimum(P + i + 1, total - 1)
        cur = jax.lax.dynamic_index_in_dim(tokens, col, axis=2,
                                           keepdims=False)
        val = jnp.where(P + i + 1 < total, new_tok, cur)
        tokens = tokens.at[:, :, col].set(val)
        flat_src = (jnp.arange(B)[:, None] * W + src).reshape(BW)
        s_axis = 4 if (use_t and not cfg.kv_cache_quant and not q8_self
                       and _loop_step_mode(cfg) == "t") else 3
        cache = _beam_gather_cache(cache, flat_src, P + i + 1, s_axis)
        finished = jnp.take_along_axis(finished, src, axis=1)
        finished = jnp.logical_or(finished, new_tok == eot)
        return (i + 1, tokens, cache, new_lp, finished), ()

    def chunk(state):
        state, _ = jax.lax.scan(step_once, state, None,
                                length=max(min(_DECODE_CHUNK, max_new), 1))
        return state

    state0 = (jnp.int32(0), tokens, cache, sum_lp, finished0)
    if _DECODE_CHUNK <= 0:
        # pure counted scan, no early exit (same A/B knob as greedy)
        state, _ = jax.lax.scan(step_once, state0, None, length=max_new)
        _, tokens, _, sum_lp, _ = state
    else:
        _, tokens, _, sum_lp, _ = jax.lax.while_loop(cond, chunk, state0)

    # rank beams by length-normalized score
    lens = _lengths(tokens, P, eot)                      # (B, W)
    gen_len = (lens - P).astype(jnp.float32)
    if opts is not None and opts.length_penalty is not None:
        norm = ((5.0 + gen_len) / 6.0) ** opts.length_penalty
    else:
        norm = gen_len
    best = jnp.argmax(sum_lp / jnp.maximum(norm, 1.0), axis=1)   # (B,)
    pick = lambda x: jnp.take_along_axis(
        x, best.reshape(B, *([1] * (x.ndim - 1))), axis=1).squeeze(1)
    return DecodeResult(tokens=pick(tokens), lengths=pick(lens),
                        sum_logprobs=pick(sum_lp),
                        no_speech_prob=no_speech_prob)


_jit_beam_prefill = functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "total", "use_t")
)(_beam_prefill)
_jit_beam_loop = functools.partial(
    jax.jit, static_argnames=("cfg", "beam_size", "max_new", "opts", "use_t")
)(_beam_loop)


@functools.partial(jax.jit, static_argnames=("cfg", "beam_size", "max_new",
                                             "opts", "total"))
def _beam_onejit(params, cfg, enc_out, prompt, beam_size, max_new, opts,
                 total):
    pre = _beam_prefill(params, cfg, enc_out, prompt, beam_size=beam_size,
                        total=total, use_t=False)
    return _beam_loop(params, cfg, *pre, prompt, beam_size=beam_size,
                      max_new=max_new, opts=opts, use_t=False)


@functools.partial(jax.jit, static_argnames=("cfg",))
def encode(params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """Jitted encoder entry point, for callers that reuse the encoder output
    across several decodes (temperature fallback, language detection)."""
    return encoder_forward(params, cfg, mel)


def decode_from_encoder(params, cfg: WhisperConfig, enc_out: jax.Array,
                        prompt: jax.Array,
                        max_new: Optional[int] = None,
                        opts: Optional[DecodeOptions] = None,
                        beam_size: int = 1,
                        rng: Optional[jax.Array] = None) -> DecodeResult:
    """Decode against a precomputed encoder output.

    Deliberately NOT jitted: greedy_decode / beam_decode self-dispatch
    their prefill and loop stages as separate jitted programs when called
    eagerly (the split compiles a dramatically faster loop — DESIGN.md
    §13); wrapping this in jit would fuse them back into one program."""
    if beam_size > 1:
        return beam_decode(params, cfg, enc_out, prompt, beam_size,
                           max_new=max_new, opts=opts)
    return greedy_decode(params, cfg, enc_out, prompt, max_new=max_new,
                         opts=opts, rng=rng)


@functools.partial(jax.jit, static_argnames=("cfg",))
def detect_language(params, cfg: WhisperConfig,
                    enc_out: jax.Array) -> jax.Array:
    """Language identification (openai/whisper detect_language semantics):
    one decoder step on a bare <|startoftranscript|> prompt, softmax over
    the language-token slice of the logits.

    Capability extension — the reference hardcodes <|en|>
    (whisper.mojo:188-191).

    Returns (B, n_languages) probabilities, index i = tokenizer.LANGUAGES[i].
    """
    B = enc_out.shape[0]
    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    cache = init_kv_cache(cfg, B, dtype=jnp.dtype(cfg.compute_dtype),
                          s_max=_cache_slots(cfg, 1))
    sot = jnp.full((B, 1), cfg.sot_token, jnp.int32)
    logits, _ = decoder_forward(params, cfg, sot, jnp.int32(0),
                                cache, cross_kv)
    lang = jax.lax.dynamic_slice_in_dim(
        logits[:, -1, :], cfg.first_language_token, cfg.n_languages, axis=-1)
    return jax.nn.softmax(lang.astype(jnp.float32), axis=-1)


def transcribe_tokens(params, cfg: WhisperConfig, mel: jax.Array,
                      prompt: jax.Array,
                      max_new: Optional[int] = None,
                      opts: Optional[DecodeOptions] = None,
                      beam_size: int = 1,
                      rng: Optional[jax.Array] = None) -> DecodeResult:
    """(B, n_mels, n_frames) mel + (B, P) prompt -> tokens, as chained
    jitted programs: [encoder] | [decode prefill] | [decode loop] (async
    dispatch pipelines the enqueues; the loop compiled as its own program
    runs ~1.5x faster per step — DESIGN.md §13). Called under an enclosing
    trace everything inlines into one program as before."""
    if isinstance(mel, jax.core.Tracer):
        enc_out = encoder_forward(params, cfg, mel)
    else:
        enc_out = encode(params, cfg, mel)
    return decode_from_encoder(params, cfg, enc_out, prompt,
                               max_new=max_new, opts=opts,
                               beam_size=beam_size, rng=rng)
