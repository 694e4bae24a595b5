"""Greedy decoding: jitted, batched, fully on-device.

Replaces the reference's host-side transcribe loop (whisper.mojo:170-223):
seed prompt -> prefill -> argmax -> per-token loop capped at 195 steps,
stopping on EOT and *including* the EOT token in the output
(whisper.mojo:205-221).

TPU-first design: the whole loop is one `lax.while_loop` inside one jit —
tokens, KV cache, and logits never leave the device, so there is no
host<->device sync per token (the single biggest latency lever at batch 1).
Batched: each sequence carries a `finished` flag; finished rows keep emitting
EOT (padding) while the loop runs until all rows finish or the cap hits —
this reproduces the reference's break-at-EOT semantics per row.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    precompute_cross_kv,
)


class DecodeResult(NamedTuple):
    tokens: jax.Array    # (B, prompt_len + 1 + max_new) int32, EOT-padded
    lengths: jax.Array   # (B,) int32 — total valid tokens incl. prompt + EOT


def _argmax_last(logits: jax.Array) -> jax.Array:
    """(B, T, V) -> (B,) argmax over the final position, int32 (reference
    whisper_tensor.mojo:431-439 — there a scalar 51,865-long scan)."""
    return jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)


def greedy_decode(params, cfg: WhisperConfig, enc_out: jax.Array,
                  prompt: jax.Array,
                  max_new: Optional[int] = None,
                  logit_bias: Optional[jax.Array] = None) -> DecodeResult:
    """Greedy decode against a computed encoder output.

    Args:
      enc_out: (B, n_audio_ctx, d_model).
      prompt: (B, P) int32 SOT sequence (P static).
      max_new: cap on loop tokens after the prefill argmax (reference: 195).
      logit_bias: optional (vocab,) additive bias applied before argmax
        (hook for suppress-token / timestamp rules; reference has none).
    """
    if max_new is None:
        max_new = cfg.max_new_tokens
    B, P = prompt.shape
    total = P + 1 + max_new
    eot = jnp.int32(cfg.eot_token)

    cross_kv = precompute_cross_kv(params, cfg, enc_out)
    cache = init_kv_cache(cfg, B, dtype=jnp.dtype(cfg.compute_dtype))

    def pick(logits):
        if logit_bias is not None:
            logits = logits + logit_bias[None, None, :]
        return _argmax_last(logits)

    # ---- prefill: all P prompt tokens in one pass (whisper.mojo:195-197) ----
    logits, cache = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                    cache, cross_kv)
    first = pick(logits)

    tokens = jnp.full((B, total), eot, dtype=jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, prompt, (0, 0))
    tokens = tokens.at[:, P].set(first)
    finished0 = first == eot

    # ---- incremental loop (whisper.mojo:205-221) ----
    def cond(state):
        i, _, _, finished = state
        return jnp.logical_and(i < max_new, jnp.logical_not(jnp.all(finished)))

    def body(state):
        i, tokens, cache, finished = state
        last = jax.lax.dynamic_slice(tokens, (0, P + i), (B, 1))
        logits, cache = decoder_forward(params, cfg, last, P + i,
                                        cache, cross_kv)
        nxt = jnp.where(finished, eot, pick(logits))
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, P + i + 1))
        finished = jnp.logical_or(finished, nxt == eot)
        return i + 1, tokens, cache, finished

    _, tokens, _, _ = jax.lax.while_loop(
        cond, body, (jnp.int32(0), tokens, cache, finished0))

    # valid length = up to and including the first EOT in the generated region
    gen = tokens[:, P:]
    is_eot = gen == eot
    any_eot = jnp.any(is_eot, axis=1)
    first_eot = jnp.argmax(is_eot, axis=1)
    gen_len = jnp.where(any_eot, first_eot + 1, gen.shape[1])
    return DecodeResult(tokens=tokens, lengths=P + gen_len.astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def transcribe_tokens(params, cfg: WhisperConfig, mel: jax.Array,
                      prompt: jax.Array,
                      max_new: Optional[int] = None) -> DecodeResult:
    """End-to-end jitted: (B, n_mels, n_frames) mel + (B, P) prompt ->
    tokens. One compilation per (model, batch, prompt-length)."""
    enc_out = encoder_forward(params, cfg, mel)
    return greedy_decode(params, cfg, enc_out, prompt, max_new=max_new)
