"""Fine-tuning: teacher-forced loss and a jittable train step.

The reference is inference-only; this module extends the framework with the
standard seq2seq fine-tuning recipe (cross-entropy over decoder positions
with teacher forcing) so Whisper checkpoints can be adapted on TPU. The step
is a pure function over (params, opt_state, batch) and composes with the
parallel/ mesh shardings: jit it with NamedSharding-annotated params and a
dp-sharded batch and GSPMD emits the gradient psums over ICI.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from whisper_tpu.config import WhisperConfig
from whisper_tpu.models.whisper import (
    encoder_forward,
    init_kv_cache,
    decoder_forward,
    precompute_cross_kv,
)

Params = Any


class TrainBatch(NamedTuple):
    mel: jax.Array         # (B, n_mels, n_frames)
    tokens: jax.Array      # (B, T) int32 — full sequence incl. SOT prompt
    loss_mask: jax.Array   # (B, T) f32 — 1 where the *next* token is a target


def loss_fn(params: Params, cfg: WhisperConfig, batch: TrainBatch) -> jax.Array:
    """Mean masked CE of next-token prediction under teacher forcing."""
    enc_out = encoder_forward(params, cfg, batch.mel)
    cross = precompute_cross_kv(params, cfg, enc_out)
    B, T = batch.tokens.shape
    cache = init_kv_cache(cfg, B, dtype=jnp.dtype(cfg.compute_dtype))
    logits, _ = decoder_forward(params, cfg, batch.tokens, jnp.int32(0),
                                cache, cross)
    # predict tokens[t+1] from position t
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = batch.tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = batch.loss_mask[:, :-1]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def make_optimizer(lr: float = 1e-5, weight_decay: float = 0.01,
                   warmup_steps: int = 50,
                   total_steps: int = 1000) -> optax.GradientTransformation:
    sched = optax.warmup_cosine_decay_schedule(
        0.0, lr, warmup_steps, max(total_steps, warmup_steps + 1))
    return optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(sched, weight_decay=weight_decay),
    )


def train_step(params: Params, opt_state, cfg: WhisperConfig,
               batch: TrainBatch,
               optimizer: optax.GradientTransformation):
    """One SGD step: returns (new_params, new_opt_state, metrics). Pure;
    jit with static (cfg, optimizer)."""
    loss, grads = jax.value_and_grad(loss_fn)(params, cfg, batch)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    gnorm = optax.global_norm(grads)
    return params, opt_state, {"loss": loss, "grad_norm": gnorm}
