"""Whole-family config/shape consistency — tiny..large-v3-turbo.

Uses jax.eval_shape: no FLOPs, validates that every family member's
parameter tree, encoder/decoder signatures, KV cache, and decode state have
consistent static shapes (the reference supports exactly one size,
whisper.mojo:29-31)."""

import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.config import CONFIGS, get_config
from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)


@pytest.mark.parametrize("name", sorted(CONFIGS))
def test_family_shapes(name):
    cfg = get_config(name)
    B = 2

    params = jax.eval_shape(
        lambda: init_params(cfg, jax.random.PRNGKey(0)))
    tok = params["decoder"]["tok_emb"]
    assert tok.shape == (cfg.vocab_size, cfg.d_model)
    assert params["encoder"]["layers"]["fc1"]["w"].shape == \
        (cfg.n_audio_layers, cfg.d_model, cfg.d_ff)

    def fwd(params):
        mel = jnp.zeros((B, cfg.n_mels, cfg.n_frames))
        enc = encoder_forward(params, cfg, mel)
        cross = precompute_cross_kv(params, cfg, enc)
        cache = init_kv_cache(cfg, B)
        logits, cache = decoder_forward(
            params, cfg, jnp.zeros((B, 4), jnp.int32), jnp.int32(0),
            cache, cross)
        return enc, logits, cache

    enc, logits, cache = jax.eval_shape(fwd, params)
    assert enc.shape == (B, cfg.n_audio_ctx, cfg.d_model)
    assert logits.shape == (B, 4, cfg.vocab_size)
    assert cache["k"].shape == (cfg.n_text_layers, B, cfg.n_heads,
                                cfg.n_text_ctx, cfg.head_dim)


@pytest.mark.parametrize("name", ["large-v3", "large-v3-turbo"])
def test_large_v3_token_layout(name):
    """large-v3 adds a 100th language token: every task token shifts by +1
    while EOT stays 50257."""
    cfg = get_config(name)
    assert cfg.eot_token == 50_257
    assert cfg.sot_token == 50_258
    assert cfg.transcribe_token == 50_360      # +1 vs tiny's 50359
    assert cfg.no_timestamps_token == 50_364
    assert cfg.timestamp_begin == 50_365
    assert cfg.n_mels == 128


def test_en_models_token_layout():
    cfg = get_config("tiny.en")
    assert cfg.eot_token == 50_256
    assert cfg.sot_token == 50_257
    assert not cfg.multilingual


def test_turbo_is_asymmetric():
    cfg = get_config("large-v3-turbo")
    assert cfg.n_audio_layers == 32
    assert cfg.n_text_layers == 4
