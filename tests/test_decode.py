"""Decode-loop semantics: EOT handling, caps, cache-vs-full-recompute."""

import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.decode import greedy_decode, transcribe_tokens
from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
from whisper_tpu.tokenizer import build_prompt


def _setup(small_cfg, batch=1, seed=0):
    params = init_params(small_cfg, jax.random.PRNGKey(seed))
    mel = jax.random.normal(jax.random.PRNGKey(seed + 1),
                            (batch, small_cfg.n_mels, small_cfg.n_frames)) * 0.5
    enc = encoder_forward(params, small_cfg, mel)
    return params, mel, enc


def test_incremental_equals_full_recompute(small_cfg):
    """KV-cached one-token-at-a-time decoding must produce the same logits
    as re-running the decoder over the whole sequence (the property the
    reference's cache design relies on, layers.mojo:130-147)."""
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    cross = precompute_cross_kv(params, cfg, enc)
    seq = [cfg.sot_token, cfg.first_language_token, cfg.transcribe_token,
           cfg.no_timestamps_token, 100, 200, 300]

    # full recompute
    cache = init_kv_cache(cfg, 1)
    full_logits, _ = decoder_forward(
        params, cfg, jnp.asarray([seq], jnp.int32), jnp.int32(0), cache, cross)

    # incremental: prefill 4, then one at a time
    cache = init_kv_cache(cfg, 1)
    logits_steps = []
    l, cache = decoder_forward(params, cfg, jnp.asarray([seq[:4]], jnp.int32),
                               jnp.int32(0), cache, cross)
    logits_steps.append(np.asarray(l)[0])
    for i in range(4, len(seq)):
        l, cache = decoder_forward(params, cfg,
                                   jnp.asarray([[seq[i]]], jnp.int32),
                                   jnp.int32(i), cache, cross)
        logits_steps.append(np.asarray(l)[0])
    inc = np.concatenate(logits_steps, axis=0)
    np.testing.assert_allclose(np.asarray(full_logits)[0], inc, atol=1e-4)


def test_eot_padding_and_lengths(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg, batch=2)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)
    res = greedy_decode(params, cfg, enc, prompt, max_new=10)
    toks = np.asarray(res.tokens)
    P = prompt.shape[1]
    assert toks.shape == (2, P + 1 + 10)
    for b in range(2):
        n = int(res.lengths[b])
        gen = toks[b, P:]
        if n < toks.shape[1]:                      # finished early
            assert gen[n - P - 1] == cfg.eot_token
            assert np.all(gen[n - P:] == cfg.eot_token)  # EOT padding after stop


def test_max_new_cap(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    res = greedy_decode(params, cfg, enc, prompt, max_new=3)
    assert int(res.lengths[0]) <= prompt.shape[1] + 1 + 3


def test_logit_bias_hook(small_cfg):
    """Forcing EOT via logit bias must terminate decode immediately."""
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    bias = jnp.full((cfg.vocab_size,), -1e9, jnp.float32).at[cfg.eot_token].set(1e9)
    res = greedy_decode(params, cfg, enc, prompt, max_new=10, logit_bias=bias)
    assert int(res.lengths[0]) == prompt.shape[1] + 1   # prefill emits EOT
    assert np.asarray(res.tokens)[0, prompt.shape[1]] == cfg.eot_token


def test_transcribe_tokens_jit_cache(small_cfg):
    """Same shapes -> cached compilation; result deterministic."""
    cfg = small_cfg
    params, mel, _ = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    r1 = transcribe_tokens(params, cfg, mel, prompt, max_new=5)
    r2 = transcribe_tokens(params, cfg, mel, prompt, max_new=5)
    np.testing.assert_array_equal(np.asarray(r1.tokens), np.asarray(r2.tokens))


def test_beam_chunk_zero_pure_scan(small_cfg, monkeypatch):
    """Regression (review r2): WHISPER_TPU_DECODE_CHUNK=0 used to spin the
    beam while_loop forever (zero-length inner scan never advanced i);
    both strategies must take the pure-scan branch and agree with the
    default schedule."""
    import whisper_tpu.decode as D
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.tokenizer import build_prompt

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (1, small_cfg.n_audio_ctx, small_cfg.d_model),
                            jnp.float32)
    prompt = jnp.asarray([build_prompt(small_cfg)], jnp.int32)
    ref_g = D.greedy_decode(params, small_cfg, enc, prompt, max_new=4)
    ref_b = D.beam_decode(params, small_cfg, enc, prompt, beam_size=2,
                          max_new=4)
    monkeypatch.setattr(D, "_DECODE_CHUNK", 0)
    got_g = D.greedy_decode(params, small_cfg, enc, prompt, max_new=4)
    got_b = D.beam_decode(params, small_cfg, enc, prompt, beam_size=2,
                          max_new=4)
    assert (np.asarray(got_g.tokens) == np.asarray(ref_g.tokens)).all()
    assert (np.asarray(got_b.tokens) == np.asarray(ref_b.tokens)).all()


def test_split_decode_optout_matches(small_cfg, monkeypatch):
    """WHISPER_TPU_SPLIT_DECODE=0: the single-program eager path produces
    identical results to the split path."""
    import whisper_tpu.decode as D
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.tokenizer import build_prompt

    params = init_params(small_cfg, jax.random.PRNGKey(2))
    enc = jax.random.normal(jax.random.PRNGKey(3),
                            (1, small_cfg.n_audio_ctx, small_cfg.d_model),
                            jnp.float32)
    prompt = jnp.asarray([build_prompt(small_cfg)], jnp.int32)
    ref = D.greedy_decode(params, small_cfg, enc, prompt, max_new=4)
    monkeypatch.setenv("WHISPER_TPU_SPLIT_DECODE", "0")
    got = D.greedy_decode(params, small_cfg, enc, prompt, max_new=4)
    got_b = D.beam_decode(params, small_cfg, enc, prompt, beam_size=2,
                          max_new=4)
    assert (np.asarray(got.tokens) == np.asarray(ref.tokens)).all()
    assert got_b.tokens.shape[0] == 1


def test_mxu_query_tiling_token_equality():
    """The d_model>=768 bf16 default (MXU query tiling, DESIGN.md §27)
    must produce the same greedy tokens as the straight T==1 form: the
    tile broadcasts q to 8 identical rows and slices row 0 — identical
    products, only accumulation grouping may differ (bf16 operand dots
    accumulate exactly in fp32)."""
    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from whisper_tpu.config import get_config
    from whisper_tpu.decode import transcribe_tokens
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    cfg = get_config("tiny").replace(
        name="mxu-nano", d_model=768, n_heads=12,
        n_audio_layers=1, n_text_layers=2,
        n_audio_ctx=64, n_text_ctx=64, compute_dtype="bfloat16")
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                       jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.3
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)

    toks = {}
    for tile in ("0", "8"):
        os.environ["WHISPER_TPU_MXU_T"] = tile
        jax.clear_caches()                 # knob is read at trace time
        try:
            r = transcribe_tokens(params, cfg, mel, prompt, max_new=6)
            toks[tile] = np.asarray(r.tokens)[0, :int(r.lengths[0])].tolist()
        finally:
            del os.environ["WHISPER_TPU_MXU_T"]
    jax.clear_caches()
    assert toks["0"] == toks["8"]
