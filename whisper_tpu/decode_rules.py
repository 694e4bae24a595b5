"""Logit-processing rules for Whisper decoding — jit-compatible.

The reference has *no* logit rules: its greedy loop argmaxes raw logits
(reference whisper.mojo:205-221) and relies on the model never emitting
degenerate tokens for its single test clip. Production Whisper decoding
(openai/whisper's DecodingTask) applies a standard stack of rules; this
module implements them as pure functions over (logits, tokens, position) so
they compose inside the jitted `lax.while_loop` decode:

  * suppress_tokens — ban a fixed id set every step (non-speech specials).
  * suppress_blank — ban " " and EOT at the first generated position.
  * timestamp rules — timestamps are monotone, come in pairs, and are
    forced when their total probability beats the best text token.

Everything here is shape-static: rule state is (tokens array, scalar pos),
and each rule returns a (vocab,)-broadcastable additive bias. NEG is a large
finite negative (not -inf) so fully-suppressed rows stay NaN-free.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig

NEG = -1e9


class DecodeOptions(NamedTuple):
    """Static decode-time options (hashable — safe as a jit static arg)."""
    suppress_tokens: tuple = ()          # extra ids to ban every step
    suppress_blank: bool = True
    timestamps: bool = False
    max_initial_timestamp_index: Optional[int] = 50   # 1.0 s at 0.02 s/step
    temperature: float = 0.0             # 0 => greedy/beam; >0 => sampling
    beam_size: int = 1
    length_penalty: Optional[float] = None  # None => simple length average


def non_speech_tokens(cfg: WhisperConfig, tokenizer=None) -> tuple:
    """The standard openai/whisper non-speech suppression set: punctuation
    runs, music symbols, etc. Computed from the vocab when a tokenizer is
    given; otherwise returns the structural specials only.

    (openai/whisper computes this list from token strings; the id values for
    the multilingual vocab are stable across tiny..large-v2.)"""
    symbols = ('"', "#", "(", ")", "*", "+", "/", ":", ";", "<", "=", ">",
               "@", "[", "\\", "]", "^", "_", "`", "{", "|", "}", "~", "「",
               "」", "『", "』", "<<", ">>", "<<<", ">>>", "--", "---", "-(",
               "-[", "('", '("', "((", "))", "(((", ")))", "[[", "]]", "{{",
               "}}", "♪♪", "♪♪♪", "♩", "♪", "♫", "♬", "♭", "♮", "♯")
    ids = set()
    if tokenizer is not None:
        lookup = {}
        for tid, tok in enumerate(tokenizer.tokens):
            lookup.setdefault(tok, tid)
        for sym in symbols:
            for cand in (sym, "Ġ" + sym):     # "Ġ" = leading space
                if cand in lookup:
                    ids.add(lookup[cand])
    # structural: sot/task/language/notimestamps specials must never be
    # *generated* (they are prompt-only)
    ids.update(range(cfg.sot_token, cfg.timestamp_begin))
    return tuple(sorted(ids))


def _static_bias(cfg: WhisperConfig, opts: DecodeOptions) -> jnp.ndarray:
    bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
    if opts.suppress_tokens:
        idx = jnp.asarray(opts.suppress_tokens, jnp.int32)
        bias = bias.at[idx].set(NEG)
    if not opts.timestamps and cfg.timestamp_begin < cfg.vocab_size:
        bias = bias.at[cfg.timestamp_begin:].set(NEG)
    return bias


def apply_rules(logits: jax.Array, tokens: jax.Array, pos,
                prompt_len: int, cfg: WhisperConfig,
                opts: DecodeOptions,
                blank_token: int = 220) -> jax.Array:
    """Apply all active rules to one step's logits.

    Args:
      logits: (B, vocab) fp32 — the final position's logits.
      tokens: (B, total) int32 — sequence so far (EOT-padded).
      pos: scalar int32 — index in `tokens` where the *next* token goes —
        or a (B,) array for ragged batches (continuous batching, where every
        row is at its own position).
      prompt_len: static int — length of the SOT prompt — or a (B,) array
        for ragged batches.
      opts: static DecodeOptions.
      blank_token: id of "Ġ" (space); 220 in the GPT-2/whisper vocab.
    Returns:
      biased logits (B, vocab).
    """
    B, V = logits.shape
    # normalize pos/prompt_len to (B, 1) columns so scalar (lockstep decode)
    # and per-row (ragged/continuous) callers share one rule implementation
    pos = jnp.broadcast_to(jnp.asarray(pos, jnp.int32), (B,)).reshape(B, 1)
    prompt_len = jnp.broadcast_to(
        jnp.asarray(prompt_len, jnp.int32), (B,)).reshape(B, 1)
    logits = logits + _static_bias(cfg, opts)[None, :]

    if opts.suppress_blank:
        first = pos == prompt_len                            # (B, 1)
        blank_bias = jnp.zeros((V,), jnp.float32).at[
            jnp.asarray([blank_token, cfg.eot_token])].set(NEG)
        logits = jnp.where(first, logits + blank_bias[None, :], logits)

    if opts.timestamps:
        logits = _timestamp_rules(logits, tokens, pos, prompt_len, cfg, opts)
    return logits


def _timestamp_rules(logits, tokens, pos, prompt_len, cfg, opts):
    """openai/whisper ApplyTimestampRules, vectorized over the batch:
      1. timestamps come in pairs (except directly before EOT): if the last
         token was a timestamp and the one before was not, the next must be
         a timestamp-or-EOT continuation => suppress text; if the last two
         were timestamps, suppress timestamps.
      2. timestamps are non-decreasing.
      3. at the first generated position, only timestamps (and EOT) are
         allowed, capped at max_initial_timestamp.
      4. if total timestamp probability exceeds the best text token, force a
         timestamp.

    pos and prompt_len arrive as (B, 1) int32 columns (see apply_rules).
    """
    B, V = logits.shape
    ts0 = cfg.timestamp_begin
    vocab_idx = jnp.arange(V)[None, :]                   # (1, V)
    is_ts_col = vocab_idx >= ts0
    # text = everything below EOT (EOT itself stays allowed where noted)
    is_text_col = vocab_idx < cfg.eot_token

    def last_tok(offset):
        i = jnp.maximum(pos - offset, 0)                 # (B, 1)
        t = jnp.take_along_axis(tokens, i, axis=1)       # (B, 1)
        return t, (pos - offset) >= prompt_len

    t1, v1 = last_tok(1)
    t2, v2 = last_tok(2)
    last_was_ts = jnp.logical_and(v1, t1 >= ts0)         # (B, 1)
    penult_was_ts = jnp.logical_and(v2, t2 >= ts0)

    # rule 1
    logits = jnp.where(jnp.logical_and(last_was_ts, penult_was_ts) & is_ts_col,
                       NEG, logits)
    logits = jnp.where(last_was_ts & ~penult_was_ts & is_text_col,
                       NEG, logits)

    # rule 2: timestamps are non-decreasing while a pair is open, and
    # strictly increasing once the pair closed (openai forces nonzero-length
    # segments: cutoff = last_ts when last_was_ts and not penult_was_ts,
    # else last_ts + 1). With no timestamp yet, max_ts = ts0-1 so the closed
    # cutoff ts0 suppresses nothing.
    gen = jnp.where(jnp.arange(tokens.shape[1])[None, :] < pos, tokens, -1)  # pos is (B,1)
    max_ts = jnp.max(jnp.where(gen >= ts0, gen, ts0 - 1), axis=1)  # (B,)
    open_pair = last_was_ts & ~penult_was_ts                       # (B, 1)
    cutoff = jnp.where(open_pair, max_ts[:, None], max_ts[:, None] + 1)
    logits = jnp.where(is_ts_col & (vocab_idx < cutoff), NEG, logits)

    # rule 3: first generated token must be a timestamp
    first = pos == prompt_len
    allowed_first = is_ts_col | (vocab_idx == cfg.eot_token)
    if opts.max_initial_timestamp_index is not None:
        cap = ts0 + opts.max_initial_timestamp_index
        allowed_first = allowed_first & (vocab_idx <= cap)
    logits = jnp.where(jnp.logical_and(first, ~allowed_first), NEG, logits)

    # rule 4: force timestamp when P(timestamps) > max P(text token)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ts_logprob = jax.nn.logsumexp(jnp.where(is_ts_col, logp, -jnp.inf), axis=-1)
    max_text = jnp.max(jnp.where(is_ts_col, -jnp.inf, logp), axis=-1)
    force_ts = (ts_logprob > max_text)[:, None]
    # openai masks logits[: timestamp_begin] here — EOT included
    logits = jnp.where(force_ts & ~is_ts_col, NEG, logits)
    return logits
