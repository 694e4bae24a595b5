"""Pallas kernel parity vs the XLA reference attention.

Kernels run in interpreter mode on the CPU test backend (the repo's
TPU-emulation path, SURVEY.md §4); the same code compiles via Mosaic on a
real TPU. Reference semantics: ops/attention.py mha_reference.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.ops.attention import mha_reference, multi_head_attention
from whisper_tpu.ops.decode_attention import decode_attention
from whisper_tpu.ops.flash_attention import flash_attention


def _qkv(rng, B, T, S, H, D, dtype=jnp.float32):
    q = jnp.asarray(rng.randn(B, T, H, D), dtype)
    k = jnp.asarray(rng.randn(B, H, S, D), dtype)
    v = jnp.asarray(rng.randn(B, H, S, D), dtype)
    return q, k, v


def test_flash_full_attention_matches_reference():
    """Encoder shape: non-causal, all keys valid, S not a block multiple."""
    rng = np.random.RandomState(0)
    q, k, v = _qkv(rng, 2, 300, 300, 3, 64)
    ref = mha_reference(q, k, v)
    out = flash_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_causal_with_offset_matches_reference():
    """Decoder prefill shape: causal over a padded cache with q_offset."""
    rng = np.random.RandomState(1)
    B, T, S, H, D = 2, 4, 448, 3, 64
    q, k, v = _qkv(rng, B, T, S, H, D)
    for q_off in (0, 5, 100):
        kv_len = q_off + T
        ref = mha_reference(q, k, v, kv_len, causal=True, q_offset=q_off)
        out = flash_attention(q, k, v, kv_len, q_off, causal=True,
                              interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=1e-5,
                                   err_msg=f"q_offset={q_off}")


def test_flash_long_causal_multi_tile():
    """Causal masking across several q tiles and k tiles (exercises the
    per-tile diagonal clipping of the dynamic kv loop)."""
    rng = np.random.RandomState(9)
    B, T, S, H, D = 1, 300, 300, 2, 64
    q, k, v = _qkv(rng, B, T, S, H, D)
    ref = mha_reference(q, k, v, S, causal=True, q_offset=0)
    out = flash_attention(q, k, v, S, 0, causal=True,
                          block_q=128, block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_flash_kv_len_masks_tail():
    """Keys beyond kv_len must not influence the output: poison the tail."""
    rng = np.random.RandomState(2)
    B, T, S, H, D = 1, 32, 256, 2, 64
    q, k, v = _qkv(rng, B, T, S, H, D)
    kv_len = 100
    k_poison = k.at[:, :, kv_len:, :].set(1e4)
    v_poison = v.at[:, :, kv_len:, :].set(1e4)
    ref = mha_reference(q, k, v, kv_len)
    out = flash_attention(q, k_poison, v_poison, kv_len, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_decode_attention_matches_reference():
    """q_len==1 streaming kernels over a padded cache at several lengths —
    both the per-(b,h) grid and the batched-heads production variant."""
    from whisper_tpu.ops.decode_attention import decode_attention_bh

    rng = np.random.RandomState(3)
    B, S, H, D = 2, 448, 3, 64
    q, k, v = _qkv(rng, B, 1, S, H, D)
    for kv_len in (1, 37, 128, 129, 448):
        ref = mha_reference(q, k, v, kv_len)
        for fn in (decode_attention, decode_attention_bh):
            out = fn(q, k, v, kv_len, interpret=True)
            np.testing.assert_allclose(
                np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-5,
                err_msg=f"{fn.__name__} kv_len={kv_len}")


def test_decode_attention_ignores_poisoned_tail():
    rng = np.random.RandomState(4)
    B, S, H, D = 1, 256, 2, 64
    q, k, v = _qkv(rng, B, 1, S, H, D)
    kv_len = 50
    k_poison = k.at[:, :, kv_len:, :].set(1e4)
    v_poison = v.at[:, :, kv_len:, :].set(-1e4)
    ref = mha_reference(q, k, v, kv_len)
    out = decode_attention(q, k_poison, v_poison, kv_len, interpret=True)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)


def test_dispatcher_selects_kernels():
    """multi_head_attention(backend='pallas_interpret') must agree with the
    reference on both the T>1 and T==1 routes."""
    rng = np.random.RandomState(5)
    q, k, v = _qkv(rng, 1, 16, 64, 2, 64)
    ref = mha_reference(q, k, v, 40, causal=True, q_offset=24)
    out = multi_head_attention(q, k, v, 40, causal=True, q_offset=24,
                               backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=1e-5)

    q1, k1, v1 = _qkv(rng, 3, 1, 64, 2, 64)
    ref1 = mha_reference(q1, k1, v1, 33, causal=True, q_offset=32)
    out1 = multi_head_attention(q1, k1, v1, 33, causal=True, q_offset=32,
                                backend="pallas_interpret")
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref1),
                               atol=2e-5, rtol=1e-5)


def test_flash_bf16_inputs():
    """bf16 q/k/v take the fast-dot path; output stays close to the fp32
    reference within bf16 tolerance."""
    rng = np.random.RandomState(7)
    q = jnp.asarray(rng.randn(1, 64, 2, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 2, 128, 64), jnp.bfloat16)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32))
    out = flash_attention(q, k, v, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.05, rtol=0.05)


def test_decode_bf16_inputs():
    rng = np.random.RandomState(8)
    q = jnp.asarray(rng.randn(2, 1, 2, 64), jnp.bfloat16)
    k = jnp.asarray(rng.randn(2, 2, 128, 64), jnp.bfloat16)
    v = jnp.asarray(rng.randn(2, 2, 128, 64), jnp.bfloat16)
    ref = mha_reference(q.astype(jnp.float32), k.astype(jnp.float32),
                        v.astype(jnp.float32), 77)
    out = decode_attention(q, k, v, 77, interpret=True)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.05, rtol=0.05)


def test_model_end_to_end_with_interpret_kernels(small_cfg):
    """Full greedy decode with Pallas kernels (interpret) must produce the
    same tokens as the XLA reference backend."""
    from whisper_tpu.decode import transcribe_tokens
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.tokenizer import build_prompt

    cfg_ref = small_cfg.replace(attn_backend="reference")
    cfg_pl = small_cfg.replace(attn_backend="pallas_interpret")
    params = init_params(cfg_ref, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg_ref.n_mels, cfg_ref.n_frames)) * 0.5
    prompt = jnp.asarray([build_prompt(cfg_ref)], jnp.int32)

    r_ref = transcribe_tokens(params, cfg_ref, mel, prompt, max_new=6)
    r_pl = transcribe_tokens(params, cfg_pl, mel, prompt, max_new=6)
    assert np.asarray(r_ref.tokens).tolist() == np.asarray(r_pl.tokens).tolist()
