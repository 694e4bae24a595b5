"""Scale-commuted int8 SELF cache (cfg.self_kv_quant, DESIGN.md §35).

The §29 cross-KV commute applied to the decode loop's other cache read:
decoder_step_ip reads an int8 self cache with the per-vector K scale on
the score axis and the V scale folded into the probabilities — no
dequantized tensor ever exists — and appends int8 rows via the aliased
Pallas kernel (scales via small XLA DUS). These tests pin:

  * cache layout: int8+scales in bf16 mode, plain in fp32 (token-parity
    mode ignores the flag);
  * the commuted step vs the explicit-dequant oracle — same cache bytes,
    mathematically identical products up to where the scale multiply
    lands (fp32 scores vs bf16 operands);
  * int8 append kernel semantics (32-sublane window, interpret mode);
  * greedy/beam e2e under sq run and agree with the dequant oracle's
    first tokens;
  * the quantizing append writes rows that dequantize to the bf16 rows.

Reference counterpart: none (the reference's cache is fp32 only,
layers.mojo:14-52); this is a capability+perf extension measured in
DESIGN.md §35.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import get_config
from whisper_tpu.models.whisper import (
    _self_attention_extra,
    _self_attention_extra_q8,
    decoder_forward,
    decoder_step_ip,
    dequantize_kv,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
    quantize_kv,
)
from whisper_tpu.weights import to_device


@pytest.fixture(scope="module")
def sq_cfg():
    return get_config("tiny").replace(
        name="sq-nano", d_model=128, n_heads=2,
        n_audio_layers=2, n_text_layers=2,
        n_audio_ctx=96, n_text_ctx=64,
        compute_dtype="bfloat16", self_kv_quant=True)


@pytest.fixture(scope="module")
def sq_state(sq_cfg):
    cfg = sq_cfg
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                       jnp.bfloat16)
    B = 2
    enc = (jax.random.normal(jax.random.PRNGKey(1),
                             (B, cfg.n_audio_ctx, cfg.d_model)) * 0.5
           ).astype(jnp.bfloat16)
    cross = precompute_cross_kv(params, cfg, enc)
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    cache = init_kv_cache(cfg, B, dtype=jnp.bfloat16)
    logits0, cache = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                     cache, cross)
    last = jnp.argmax(logits0[:, -1:, :], axis=-1).astype(jnp.int32)
    return cfg, params, enc, cross, prompt, cache, last


def test_init_cache_layout(sq_cfg):
    c = init_kv_cache(sq_cfg, 2, dtype=jnp.bfloat16, s_max=64)
    assert c["k"].dtype == jnp.int8 and c["v"].dtype == jnp.int8
    assert c["k_s"].shape == c["k"].shape[:-1] + (1,)
    assert c["k_s"].dtype == jnp.float32
    # fp32 (token-parity) mode ignores the flag: full-precision cache
    c32 = init_kv_cache(sq_cfg.replace(compute_dtype="float32"), 2,
                        dtype=jnp.float32, s_max=64)
    assert "k_s" not in c32 and c32["k"].dtype == jnp.float32


@pytest.mark.parametrize("pos", [0, 7, 31, 32, 57])
def test_append_kernel_int8(pos):
    """int8 caches use a 32-sublane window (Mosaic packed-int8 tiling);
    interpret-mode semantics must equal a row write."""
    from whisper_tpu.ops.cache_append import cache_append_rows
    L, B, H, S, D = 2, 2, 2, 64, 64
    rng = np.random.RandomState(0)
    ck = jnp.asarray(rng.randint(-127, 128, (L, B, H, S, D)), jnp.int8)
    cv = jnp.asarray(rng.randint(-127, 128, (L, B, H, S, D)), jnp.int8)
    kn = jnp.asarray(rng.randint(-127, 128, (L, B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (L, B, H, D)), jnp.int8)
    ok, ov = cache_append_rows(ck, cv, kn, vn, pos, interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ok), np.asarray(ck.at[:, :, :, pos, :].set(kn)))
    np.testing.assert_array_equal(
        np.asarray(ov), np.asarray(cv.at[:, :, :, pos, :].set(vn)))


def test_commuted_attention_matches_dequant():
    """_self_attention_extra_q8 on (int8, scales) == _self_attention_extra
    on the dequantized cache, up to bf16 rounding of where the scale
    multiply lands (operand vs score axis)."""
    rng = np.random.RandomState(0)
    B, H, S, D = 2, 2, 64, 64
    q = jnp.asarray(rng.randn(B, 1, H, D), jnp.bfloat16)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    k_new = jnp.asarray(rng.randn(B, H, 1, D), jnp.bfloat16)
    v_new = jnp.asarray(rng.randn(B, H, 1, D), jnp.bfloat16)
    mask = (jnp.arange(S) < 40)[None, None, None, :]
    for t8 in (0, 8):
        o_q8 = _self_attention_extra_q8(q, k8, ks, v8, vs, k_new, v_new,
                                        mask, D, jnp.bfloat16, mxu_t=t8)
        o_ref = _self_attention_extra(
            q, dequantize_kv(k8, ks, jnp.bfloat16),
            dequantize_kv(v8, vs, jnp.bfloat16), k_new, v_new,
            mask, D, jnp.bfloat16, mxu_t=t8)
        np.testing.assert_allclose(
            np.asarray(o_q8, np.float32), np.asarray(o_ref, np.float32),
            atol=3e-2, rtol=3e-2)


@pytest.mark.parametrize("backend", [None, "pallas_interpret"])
def test_step_ip_sq_matches_dequant_oracle(sq_state, backend):
    """One commuted step on the int8 cache vs the same step on that
    cache's dequantized bf16 copy: argmax-equal logits, close values, and
    the appended row dequantizes to the oracle's appended row."""
    cfg, params, enc, cross, prompt, cache, last = sq_state
    P = prompt.shape[1]
    cfg_b = cfg.replace(attn_backend=backend)
    li, ci = decoder_step_ip(params, cfg_b, last, jnp.int32(P), cache,
                             cross)
    deq = {"k": dequantize_kv(cache["k"], cache["k_s"], jnp.bfloat16),
           "v": dequantize_kv(cache["v"], cache["v_s"], jnp.bfloat16)}
    cfg_plain = dataclasses.replace(cfg_b, self_kv_quant=False)
    lr, cr = decoder_step_ip(params, cfg_plain, last, jnp.int32(P), deq,
                             cross)
    assert (jnp.argmax(li[:, -1], -1) == jnp.argmax(lr[:, -1], -1)).all()
    np.testing.assert_allclose(np.asarray(li, np.float32),
                               np.asarray(lr, np.float32),
                               atol=0.15, rtol=5e-2)
    # the quantizing append wrote row P: dequantize and compare to the
    # bf16 row the oracle wrote (per-vector int8 rounding = ~1/127 rel)
    row_q = dequantize_kv(ci["k"], ci["k_s"], jnp.bfloat16)[:, :, :, P, :]
    row_r = cr["k"][:, :, :, P, :]
    np.testing.assert_allclose(np.asarray(row_q, np.float32),
                               np.asarray(row_r, np.float32),
                               atol=3e-2, rtol=3e-2)
    # slots past P are untouched int8 zeros
    assert int(jnp.abs(ci["k"][:, :, :, P + 1:, :]).sum()) == 0


def test_greedy_sq_end_to_end(sq_cfg):
    """Greedy under sq runs eagerly (split-stage, ip step) and inline
    (decoder_forward fallback under trace) with identical tokens."""
    from whisper_tpu.decode import greedy_decode
    cfg = sq_cfg
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                       jnp.bfloat16)
    enc = (jax.random.normal(jax.random.PRNGKey(1),
                             (2, cfg.n_audio_ctx, cfg.d_model)) * 0.5
           ).astype(jnp.bfloat16)
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    r = greedy_decode(params, cfg, enc, prompt, max_new=11)
    assert r.tokens.shape[0] == 2 and r.tokens.shape[1] >= 3 + 11

    @jax.jit
    def inline(p_, e_, pr_):
        return greedy_decode(p_, cfg, e_, pr_, max_new=11).tokens

    np.testing.assert_array_equal(np.asarray(r.tokens),
                                  np.asarray(inline(params, enc, prompt)))


def test_beam_sq_matches_dequant_oracle(sq_cfg):
    """Beam under sq vs the kv_cache_quant dequant oracle: TOKEN equality.

    Both routes hold byte-identical int8 cache contents (same quantize_kv
    on the same appended rows); they differ only in where the scale
    multiply lands (commuted onto the score axis vs explicit dequant
    before the dot) — mathematically identical products up to bf16/fp32
    rounding. The decoder token embedding is amplified 4x so argmax
    margins (~O(40)) dwarf that rounding (~O(0.1)); equality then
    certifies the beam-reorder gather of int8 values AND their scales —
    quant x beam being this codebase's one historical miscompile surface
    (DESIGN.md §31)."""
    from whisper_tpu.decode import beam_decode
    cfg = sq_cfg
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                       jnp.bfloat16)
    dec = dict(params["decoder"])
    dec["tok_emb"] = dec["tok_emb"] * 4.0
    params = dict(params, decoder=dec)
    enc = (jax.random.normal(jax.random.PRNGKey(1),
                             (2, cfg.n_audio_ctx, cfg.d_model)) * 0.5
           ).astype(jnp.bfloat16)
    prompt = jnp.asarray([[1, 2, 3], [4, 5, 6]], jnp.int32)
    r = beam_decode(params, cfg, enc, prompt, beam_size=3, max_new=8)
    assert r.tokens.shape[0] == 2
    assert np.isfinite(np.asarray(r.sum_logprobs)).all()
    cfg_oracle = dataclasses.replace(cfg, self_kv_quant=False,
                                     kv_cache_quant=True)
    ref = beam_decode(params, cfg_oracle, enc, prompt, beam_size=3,
                      max_new=8)
    np.testing.assert_array_equal(np.asarray(r.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(r.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(r.sum_logprobs, np.float32),
                               np.asarray(ref.sum_logprobs, np.float32),
                               atol=0.1, rtol=5e-2)


def test_step_ragged_sq_matches_dequant_oracle(sq_state):
    """decoder_step_ragged under sq (per-row positions) reads commuted
    and appends int8: compare against the plain ragged step on the
    dequantized cache copy at the same positions."""
    from whisper_tpu.models.whisper import decoder_step_ragged
    cfg, params, enc, cross, prompt, cache, last = sq_state
    P = prompt.shape[1]
    pos = jnp.asarray([P, P], jnp.int32)
    li, ci = decoder_step_ragged(params, cfg, last, pos, cache, cross)
    deq = {"k": dequantize_kv(cache["k"], cache["k_s"], jnp.bfloat16),
           "v": dequantize_kv(cache["v"], cache["v_s"], jnp.bfloat16)}
    cfg_plain = dataclasses.replace(cfg, self_kv_quant=False)
    lr, cr = decoder_step_ragged(params, cfg_plain, last, pos, deq, cross)
    assert (jnp.argmax(li[:, -1], -1) == jnp.argmax(lr[:, -1], -1)).all()
    np.testing.assert_allclose(np.asarray(li, np.float32),
                               np.asarray(lr, np.float32),
                               atol=0.15, rtol=5e-2)
    # int8 rows written at each row's own position with fresh scales
    row_q = dequantize_kv(ci["k"], ci["k_s"], jnp.bfloat16)[:, :, :, P, :]
    np.testing.assert_allclose(np.asarray(row_q, np.float32),
                               np.asarray(cr["k"][:, :, :, P, :],
                                          np.float32),
                               atol=3e-2, rtol=3e-2)


def test_ragged_kernel_int8():
    """Per-row int8 append through the ragged Pallas kernel (interpret):
    32-sublane windows at distinct per-row positions."""
    from whisper_tpu.ops.cache_append import cache_append_rows_ragged
    L, B, H, S, D = 2, 4, 2, 64, 64
    rng = np.random.RandomState(0)
    ck = jnp.asarray(rng.randint(-127, 128, (L, B, H, S, D)), jnp.int8)
    cv = jnp.asarray(rng.randint(-127, 128, (L, B, H, S, D)), jnp.int8)
    kn = jnp.asarray(rng.randint(-127, 128, (L, B, H, D)), jnp.int8)
    vn = jnp.asarray(rng.randint(-127, 128, (L, B, H, D)), jnp.int8)
    pos = jnp.asarray([0, 31, 32, 63], jnp.int32)
    ok, ov = cache_append_rows_ragged(ck, cv, kn, vn, pos, interpret=True)
    ek, ev = ck, cv
    for b in range(4):
        ek = ek.at[:, b, :, int(pos[b]), :].set(kn[:, b])
        ev = ev.at[:, b, :, int(pos[b]), :].set(vn[:, b])
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ev))


def test_fp32_parity_mode_ignores_sq(sq_cfg):
    """fp32 token-parity mode must be byte-identical with and without the
    flag: the quantized self cache is serving-mode only."""
    from whisper_tpu.decode import greedy_decode
    cfg32 = dataclasses.replace(sq_cfg, compute_dtype="float32")
    params = init_params(cfg32, jax.random.PRNGKey(0))
    enc = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg32.n_audio_ctx, cfg32.d_model)) * 0.5
    prompt = jnp.asarray([[1, 2, 3]], jnp.int32)
    r_sq = greedy_decode(params, cfg32, enc, prompt, max_new=7)
    r_pl = greedy_decode(params,
                         dataclasses.replace(cfg32, self_kv_quant=False),
                         enc, prompt, max_new=7)
    np.testing.assert_array_equal(np.asarray(r_sq.tokens),
                                  np.asarray(r_pl.tokens))
