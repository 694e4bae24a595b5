"""Weight-only int8 quantization (cfg.weight_quant, DESIGN.md §28).

The contract under test: a run with the quantized tree is BIT-IDENTICAL to
a run whose weights were pre-materialized as int8→bf16 × scale (the
in-graph dequant changes no values, only where the bytes live), and the
quantization error vs the original weights is bounded by the per-column
scale. The reference has no quantization (fp32 throughout); this is a
TPU-serving capability beyond parity.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.whisper import (
    _quant_cols,
    decoder_forward,
    decoder_step_ragged,
    dequantize_weights_wq,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
    quantize_weights_wq,
)
from whisper_tpu.tokenizer import build_prompt


@pytest.fixture(scope="module")
def nano_bf16(small_cfg):
    return small_cfg.replace(compute_dtype="bfloat16", weight_quant=True)


@pytest.fixture(scope="module")
def wq_setup(nano_bf16):
    from whisper_tpu.weights import to_device
    cfg = nano_bf16
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    qparams = quantize_weights_wq(params, cfg)
    mparams = dequantize_weights_wq(qparams, jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (2, cfg.n_mels, cfg.n_frames),
                            jnp.bfloat16) * 0.5
    return cfg, params, qparams, mparams, mel


def test_quant_cols_error_bound():
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(3, 32, 48) * 0.3, jnp.float32)
    q, s = _quant_cols(w)
    assert q.dtype == jnp.int8 and s.shape == (3, 48)
    y = np.asarray(q, np.float32) * np.asarray(s)[:, None, :]
    bound = np.max(np.abs(np.asarray(w)), axis=-2, keepdims=True) / 254.0
    assert (np.abs(y - np.asarray(w)) <= bound + 1e-7).all()


def test_wq_structure(wq_setup):
    cfg, params, qparams, _, _ = wq_setup
    dec = qparams["decoder"]
    # per-step-read weights are int8 with per-out-column scales
    for name in ("q", "k", "v", "o"):
        assert dec["layers"]["attn"][name]["w"].dtype == jnp.int8
        assert dec["layers"]["attn"][name]["w_s"].shape == (
            cfg.n_text_layers, cfg.d_model)
    assert dec["layers"]["fc1"]["w"].dtype == jnp.int8
    assert dec["layers"]["cross_attn"]["q"]["w"].dtype == jnp.int8
    assert dec["tok_emb"].dtype == jnp.int8
    assert dec["tok_emb_s"].shape == (cfg.vocab_size,)
    # NOT quantized: cross k/v projections (read once per transcription),
    # the whole encoder, biases
    assert dec["layers"]["cross_attn"]["k"]["w"].dtype == jnp.bfloat16
    assert dec["layers"]["cross_attn"]["v"]["w"].dtype == jnp.bfloat16
    assert jax.tree.reduce(
        lambda a, x: a and x.dtype != jnp.int8,
        qparams["encoder"], True)
    assert dec["layers"]["attn"]["q"]["b"].dtype == jnp.bfloat16


def test_wq_rejects_fp32(small_cfg):
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="token-parity"):
        quantize_weights_wq(params, small_cfg)


def test_wq_fused_step_disabled(nano_bf16):
    from whisper_tpu.decode import _fused_step_enabled
    assert not _fused_step_enabled(nano_bf16.replace(fused_step=True))


def test_wq_prefill_logits_exact_vs_materialized(wq_setup):
    """decoder_forward with the quantized tree == the materialized-dequant
    tree, bitwise: the in-graph dequant computes the identical effective
    weights."""
    cfg, _, qparams, mparams, mel = wq_setup
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)

    def logits_for(p):
        enc = encoder_forward(p, cfg, mel)
        cross = precompute_cross_kv(p, cfg, enc)
        cache = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
        l, _ = decoder_forward(p, cfg, prompt, jnp.int32(0), cache, cross)
        return np.asarray(l)

    np.testing.assert_array_equal(logits_for(qparams), logits_for(mparams))


def test_wq_greedy_tokens_exact_vs_materialized(wq_setup):
    cfg, _, qparams, mparams, mel = wq_setup
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)

    def toks(p):
        enc = encoder_forward(p, cfg, mel)
        return np.asarray(
            greedy_decode(p, cfg, enc, prompt, max_new=12).tokens)

    np.testing.assert_array_equal(toks(qparams), toks(mparams))


def test_wq_logits_close_to_unquantized(wq_setup):
    """Accuracy sanity: int8 weights move the prefill logits by a small
    amount relative to the unquantized bf16 run (|logits| ~ O(1) on the
    nano random model)."""
    cfg, params, qparams, _, mel = wq_setup
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)

    def logits_for(p):
        enc = encoder_forward(p, cfg, mel)
        cross = precompute_cross_kv(p, cfg, enc)
        cache = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
        l, _ = decoder_forward(p, cfg, prompt, jnp.int32(0), cache, cross)
        return np.asarray(l, np.float32)

    lq, lu = logits_for(qparams), logits_for(params)
    scale = np.abs(lu).max()
    assert np.abs(lq - lu).max() < 0.05 * scale + 0.05


def test_wq_ragged_step_exact(wq_setup):
    """The continuous-batching step (decoder_step_ragged) consumes the
    quantized tree through the same linear/qkv_fused/tok_embed paths."""
    cfg, _, qparams, mparams, mel = wq_setup
    enc = encoder_forward(qparams, cfg, mel)
    tok = jnp.asarray([[cfg.sot_token], [cfg.eot_token]], jnp.int32)
    pos = jnp.asarray([3, 7], jnp.int32)

    def step(p):
        cross = precompute_cross_kv(p, cfg, enc)
        cache = init_kv_cache(cfg, 2, dtype=jnp.bfloat16)
        l, _ = decoder_step_ragged(p, cfg, tok, pos, cache, cross)
        return np.asarray(l)

    np.testing.assert_array_equal(step(qparams), step(mparams))


def test_wq_shard_params_rejected(wq_setup):
    cfg, _, qparams, _, _ = wq_setup
    from whisper_tpu.parallel.mesh import make_mesh, shard_params
    mesh = make_mesh(dp=4, sp=1, tp=2, pp=1)
    with pytest.raises(NotImplementedError, match="weight_quant"):
        shard_params(qparams, mesh)


def test_wq_pipeline_engages(nano_bf16):
    """WhisperPipeline applies quantize_weights_wq when cfg.weight_quant."""
    from whisper_tpu.pipeline import WhisperPipeline
    pipe = WhisperPipeline.from_random(nano_bf16)
    assert pipe.params["decoder"]["tok_emb"].dtype == jnp.int8
    assert "tok_emb_s" in pipe.params["decoder"]
