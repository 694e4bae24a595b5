"""Speculative decoding: a small draft model proposes k tokens, the big
target model verifies them in ONE multi-position decoder pass.

The reference has no counterpart (greedy-only, one model,
whisper.mojo:205-221); this is a serving capability the framework adds
on top of exact greedy semantics: **output tokens are bit-identical to
running greedy decode on the target alone** (tested), because the target
argmax is computed at every position and drafts are accepted only while
they match it. What speculation buys is fewer target dispatches: at
medium/large the decode step is dominated by the per-step WEIGHT read
(0.8–1.9 GB, DESIGN.md §25/§28) which a (k+1)-position verify pays ONCE
for k+1 tokens' worth of progress.

TPU-first shape discipline (SURVEY.md §6): k is static, the verify is a
fixed (B, k+1) `decoder_forward`, acceptance is a lockstep scalar
(min over active rows) so every array keeps a static shape, and the
whole decode is one `lax.while_loop` in one jitted program. Rejected
draft rows leave stale K/V in both caches; that is safe by construction:
reads are masked to `kv_len = pos_offset + T` of the current call, and
every later window rewrites exactly the columns it needs before reading
them (positions are written when consumed, DUS at the row's own offset).
One position needs explicit care: the draft scan feeds `last, d_1..
d_{k-1}` (rows q..q+k-1) but never d_k, so on FULL acceptance (m == k)
the next round would read a never-written draft row at q+k. A
`lax.cond`-gated T=1 draft pass writes that row exactly when m == k
(when m < k the next round's scan rewrites it before any read).

Natural family pairs (same vocab + special-token layout, enforced):
tiny/base/small -> medium/large-v2 (51,865), and large-v3-turbo ->
large-v3 (51,866; turbo IS large-v3 with a 4-layer decoder, so it is the
canonical draft). Greedy only (temperature/rules raise); `logit_bias`
is supported and applied to BOTH models' logits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.decode import DecodeResult, _cache_slots, _lengths
from whisper_tpu.models.whisper import (
    decoder_forward,
    init_kv_cache,
    precompute_cross_kv,
)


def _check_pair(t_cfg: WhisperConfig, d_cfg: WhisperConfig) -> None:
    """Draft/target must agree on the token space, or acceptance is
    meaningless and prompts diverge."""
    for f in ("vocab_size", "eot_token", "sot_token", "n_languages",
              "multilingual"):
        tv, dv = getattr(t_cfg, f), getattr(d_cfg, f)
        if tv != dv:
            raise ValueError(
                f"speculative pair mismatch on {f}: target={tv} draft={dv} "
                f"(pair models with the same vocab/token layout, e.g. "
                f"base->large-v2 or large-v3-turbo->large-v3)")


@functools.partial(jax.jit, static_argnames=("t_cfg", "d_cfg", "k",
                                             "max_new"))
def _spec_decode_jit(t_params, t_cfg: WhisperConfig,
                     d_params, d_cfg: WhisperConfig,
                     t_enc_out, d_enc_out, prompt,
                     logit_bias, k: int, max_new: int) -> DecodeResult:
    B, P = prompt.shape
    eot = jnp.int32(t_cfg.eot_token)
    # +k headroom: the final window may overshoot the cap; the result is
    # sliced back to the greedy-comparable width before returning.
    total = P + 1 + max_new + k + 1
    f32 = jnp.float32

    def biased(logits):
        l = logits[..., :]  # (B, T, V) fp32
        if logit_bias is not None:
            l = l + logit_bias[None, None, :]
        return l

    # ---- stage 1: cross-KV + prompt prefill for BOTH models ----
    t_cross = precompute_cross_kv(t_params, t_cfg, t_enc_out)
    d_cross = precompute_cross_kv(d_params, d_cfg, d_enc_out)
    t_cache = init_kv_cache(t_cfg, B, dtype=jnp.dtype(t_cfg.compute_dtype),
                            s_max=_cache_slots(t_cfg, total))
    d_cache = init_kv_cache(d_cfg, B, dtype=jnp.dtype(d_cfg.compute_dtype),
                            s_max=_cache_slots(d_cfg, total))
    tokens = jnp.full((B, total), eot, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))

    t_logits, t_cache = decoder_forward(t_params, t_cfg, prompt,
                                        jnp.int32(0), t_cache, t_cross)
    _, d_cache = decoder_forward(d_params, d_cfg, prompt,
                                 jnp.int32(0), d_cache, d_cross)

    lastl = biased(t_logits)[:, -1, :]
    first = jnp.argmax(lastl, axis=-1).astype(jnp.int32)
    lp = jax.nn.log_softmax(lastl.astype(f32), axis=-1)
    sum_lp0 = jnp.take_along_axis(lp, first[:, None], axis=-1)[:, 0]
    tokens = tokens.at[:, P].set(first)
    finished0 = first == eot

    # openai no-speech signal at the SOT position (same as greedy_decode)
    sot_idx = jnp.argmax(prompt == jnp.int32(t_cfg.sot_token), axis=1)
    sot_logits = jnp.take_along_axis(
        t_logits, sot_idx[:, None, None], axis=1)[:, 0, :]
    no_speech_prob = jax.nn.softmax(sot_logits.astype(f32), axis=-1
                                    )[:, t_cfg.no_speech_token]

    # ---- speculative loop ----
    # carry: q = absolute position of the newest token (whose K/V is not
    # yet in either cache); n = tokens emitted AFTER the first pick
    # (greedy's max_new counts loop tokens after the prefill argmax).
    def cond(state):
        q, n, *_, finished, _lp, _r, _a = state
        return (n < max_new) & ~jnp.all(finished)

    def body(state):
        (q, n, tokens, t_cache, d_cache, finished, sum_lp,
         rounds, accepted) = state

        # 1) draft k tokens autoregressively (T=1 steps)
        def draft_step(carry, i):
            d_cache, cur = carry
            logits, d_cache = decoder_forward(d_params, d_cfg, cur[:, None],
                                              q + i, d_cache, d_cross)
            nxt = jnp.argmax(biased(logits)[:, -1, :], axis=-1
                             ).astype(jnp.int32)
            return (d_cache, nxt), nxt

        last_tok = jax.lax.dynamic_slice(tokens, (0, q), (B, 1))[:, 0]
        (d_cache, _), drafts = jax.lax.scan(
            draft_step, (d_cache, last_tok), jnp.arange(k))
        drafts = drafts.T                                     # (B, k)

        # 2) target verifies [last, d_1..d_k] in one pass
        window_in = jnp.concatenate([last_tok[:, None], drafts], axis=1)
        v_logits, t_cache = decoder_forward(t_params, t_cfg, window_in,
                                            q, t_cache, t_cross)
        v_biased = biased(v_logits)                           # (B, k+1, V)
        greedy = jnp.argmax(v_biased, axis=-1).astype(jnp.int32)

        # 3) lockstep acceptance: leading drafts matching the target argmax
        eq = (drafts == greedy[:, :k])                        # (B, k)
        m_row = jnp.sum(jnp.cumprod(eq.astype(jnp.int32), axis=1), axis=1)
        m = jnp.min(jnp.where(finished, k, m_row))            # scalar

        # 4) build the (k+1)-wide token slab: d_1..d_m, g_m, EOT-pad;
        #    then propagate EOT (nothing follows an accepted EOT)
        j = jnp.arange(k + 1)[None, :]                        # (1, k+1)
        gm = jax.lax.dynamic_slice_in_dim(greedy, m, 1, axis=1)  # (B, 1)
        dpad = jnp.concatenate([drafts, gm], axis=1)          # (B, k+1)
        slab = jnp.where(j < m, dpad, jnp.where(j == m, gm, eot))
        seen_eot = jnp.cumsum((slab == eot).astype(jnp.int32), axis=1)
        slab = jnp.where(seen_eot - (slab == eot) > 0, eot, slab)
        slab = jnp.where(finished[:, None], eot, slab)

        # per-token logprobs of the emitted slab under the TARGET
        lps = jax.nn.log_softmax(v_biased.astype(f32), axis=-1)
        tok_lp = jnp.take_along_axis(lps, slab[:, :, None], axis=-1)[..., 0]
        # count j<=m, not beyond the cap, not after this row finished
        emit = ((j <= m) & ~finished[:, None]
                & (seen_eot - (slab == eot) <= 0)
                & (n + j < max_new))
        sum_lp = sum_lp + jnp.sum(jnp.where(emit, tok_lp, 0.0), axis=1)

        # full acceptance leaves the draft cache with a hole at q+k (d_k
        # was drafted but never fed); fill it so the next round's draft
        # attends over a complete prefix — otherwise acceptance silently
        # degrades in exactly the high-acceptance regime speculation
        # exists for. m < k needs nothing: rows q+m+1..q+m+k are
        # rewritten by the next scan before any read.
        d_cache = jax.lax.cond(
            m == k,
            lambda c: decoder_forward(d_params, d_cfg, drafts[:, k - 1:k],
                                      q + k, c, d_cross)[1],
            lambda c: c,
            d_cache)

        tokens = jax.lax.dynamic_update_slice(tokens, slab, (0, q + 1))
        # only the ACCEPTED window (j <= m) can finish a row — positions
        # beyond m are EOT *padding*, rewritten by the next window
        finished = finished | jnp.any((slab == eot) & (j <= m), axis=1)
        return (q + m + 1, n + m + 1, tokens, t_cache, d_cache,
                finished, sum_lp, rounds + 1, accepted + m)

    state = (jnp.int32(P), jnp.int32(0), tokens, t_cache, d_cache,
             finished0, sum_lp0, jnp.int32(0), jnp.int32(0))
    (_, _, tokens, _, _, _, sum_lp, rounds,
     accepted) = jax.lax.while_loop(cond, body, state)

    tokens = tokens[:, :P + 1 + max_new]
    res = DecodeResult(tokens=tokens, lengths=_lengths(tokens, P, eot),
                       sum_logprobs=sum_lp, no_speech_prob=no_speech_prob)
    return res, {"rounds": rounds, "accepted_drafts": accepted}


def speculative_decode(t_params, t_cfg: WhisperConfig,
                       d_params, d_cfg: WhisperConfig,
                       t_enc_out, d_enc_out, prompt,
                       max_new: Optional[int] = None, k: int = 4,
                       logit_bias=None, return_stats: bool = False):
    """Greedy decode of the TARGET model, accelerated by a draft model.

    Tokens are exactly equal to `greedy_decode(t_params, t_cfg, ...)`
    (tests/test_speculative.py pins this) — speculation changes the
    dispatch pattern, never the output. Prompt must already be the
    shared-token-space prompt (build_prompt gives identical ids for a
    valid pair). k: draft tokens per round (static; 4–8 typical).

    return_stats=True additionally returns `{"rounds", "accepted_drafts"}`
    (scalar int32 arrays) — verify rounds executed and total accepted
    draft tokens; acceptance rate = accepted_drafts / (rounds * k). The
    benchmarking surface `benchmarks/spec_bench.py` builds its measured
    envelope from these.

    `self_kv_quant` is normalized OFF on both configs: it is a batched-
    serving throughput feature (DESIGN.md §35, adopted at b16+; the
    small-shape overhead pattern of §29b makes it a cost at spec's b1),
    and its commuted single-token step arithmetic rounds differently
    from the multi-token verify window's dequant route — keeping it on
    would break the exact-greedy-equality contract this function exists
    for. Weight-only/cross quant (wq/cq) are unaffected.
    """
    if t_cfg.self_kv_quant:
        t_cfg = t_cfg.replace(self_kv_quant=False)
    if d_cfg.self_kv_quant:
        d_cfg = d_cfg.replace(self_kv_quant=False)
    _check_pair(t_cfg, d_cfg)
    if max_new is None:
        max_new = t_cfg.max_new_tokens
    if k < 1:
        raise ValueError("k must be >= 1")
    res, stats = _spec_decode_jit(t_params, t_cfg, d_params, d_cfg,
                                  t_enc_out, d_enc_out, prompt,
                                  logit_bias, k=int(k), max_new=int(max_new))
    return (res, stats) if return_stats else res


def spec_transcribe_window(target, draft, audio, language: str = "en",
                           task: str = "transcribe",
                           max_new: Optional[int] = None, k: int = 4):
    """One <=30 s window through the speculative path, pipeline-level.

    target/draft: WhisperPipeline instances forming a valid pair (checked).
    Each model computes its own mel/encoder (n_mels may differ within a
    pair, e.g. none today, but the frontend is per-config regardless);
    tokens come out identical to `target.transcribe_window` greedy —
    with one caveat: `speculative_decode` normalizes `self_kv_quant`
    OFF (see its docstring), so if the target pipeline carries sq (the
    §35 serving default at d_model>=1024 deep decoders, or an explicit
    --self-kv-quant), this path matches the sq-OFF greedy tokens, which
    may differ from an sq-ON `transcribe_window` by int8 self-cache
    rounding. The CLI warns when it strips an explicitly-set flag.
    Returns a pipeline Transcription (text/tokens/timings).
    """
    import time

    import numpy as np

    from whisper_tpu.audio import log_mel_spectrogram, pad_or_trim
    from whisper_tpu.decode import encode
    from whisper_tpu.pipeline import Transcription
    from whisper_tpu.tokenizer import build_prompt

    t_cfg, d_cfg = target.cfg, draft.cfg
    _check_pair(t_cfg, d_cfg)
    t0 = time.perf_counter()
    t_wav = jnp.asarray(pad_or_trim(audio, t_cfg.n_samples))[None]
    d_wav = jnp.asarray(pad_or_trim(audio, d_cfg.n_samples))[None]
    t_enc = encode(target.params, t_cfg, log_mel_spectrogram(t_wav, t_cfg))
    d_enc = encode(draft.params, d_cfg, log_mel_spectrogram(d_wav, d_cfg))
    if language == "auto":
        language = target.detect_language(t_enc)
    prompt = jnp.asarray([build_prompt(t_cfg, language, task)], jnp.int32)
    # block on BOTH frontends so the draft's mel+encoder cost lands in
    # encode_s, not smeared into the decode timing
    jax.block_until_ready((t_enc, d_enc))
    t1 = time.perf_counter()
    res, stats = speculative_decode(target.params, t_cfg, draft.params,
                                    d_cfg, t_enc, d_enc, prompt,
                                    max_new=max_new, k=k, return_stats=True)
    res.tokens.block_until_ready()
    t2 = time.perf_counter()
    n = int(res.lengths[0])
    ids = np.asarray(res.tokens)[0, :n].tolist()
    return Transcription(
        text=target.tokenizer.decode(ids),
        tokens=ids,
        timings={"encode_s": t1 - t0, "decode_s": t2 - t1,
                 "total_s": t2 - t0, "draft_k": k,
                 "verify_rounds": int(stats["rounds"]),
                 "accepted_drafts": int(stats["accepted_drafts"])})
