"""Fused decoder-step megakernel (ops/decoder_step.py) parity vs the XLA
decode path — interpret mode on CPU (the repo's TPU-emulation strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.decode import _make_fused_step, greedy_decode
from whisper_tpu.models.whisper import (
    decoder_forward,
    final_logits,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
from whisper_tpu.ops.decoder_step import from_head_outer, to_head_outer
from whisper_tpu.tokenizer import build_prompt


@pytest.fixture(scope="module")
def setup(small_cfg):
    cfg = small_cfg.replace(attn_backend="reference")
    params = init_params(cfg, jax.random.PRNGKey(3))
    B = 2
    enc = jax.random.normal(jax.random.PRNGKey(4),
                            (B, cfg.n_audio_ctx, cfg.d_model), jnp.float32)
    cross = precompute_cross_kv(params, cfg, enc)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    cache = init_kv_cache(cfg, B)
    logits_p, cache = decoder_forward(params, cfg, prompt, jnp.int32(0),
                                      cache, cross)
    first = jnp.argmax(logits_p[:, -1, :], axis=-1).astype(jnp.int32)
    return cfg, params, enc, cross, prompt, cache, first


def _xla_step(params, cfg, cross, last, pos, cache):
    return decoder_forward(params, cfg, last, pos, cache, cross)


class TestStepParity:
    def test_single_step_logits_match(self, setup):
        cfg, params, enc, cross, prompt, cache, first = setup
        P = prompt.shape[1]
        last = first[:, None]
        ref_logits, ref_cache = _xla_step(params, cfg, cross, last,
                                          jnp.int32(P), cache)

        step, ho_cache = _make_fused_step(params, cfg.replace(fused_step=True),
                                          cache, cross)
        got_logits, got_cache = step(last, jnp.int32(P), ho_cache)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(ref_logits),
                                   rtol=1e-4, atol=1e-4)
        # cache writes agree at the new position (and only there)
        back = from_head_outer(got_cache["k"], batch=last.shape[0])
        np.testing.assert_allclose(np.asarray(back),
                                   np.asarray(ref_cache["k"]),
                                   rtol=1e-4, atol=1e-5)

    def test_three_chained_steps(self, setup):
        """Errors don't compound: run 3 fused steps feeding argmax tokens,
        compare logits against the XLA path at every step."""
        cfg, params, enc, cross, prompt, cache, first = setup
        P = prompt.shape[1]
        step, ho_cache = _make_fused_step(params, cfg.replace(fused_step=True),
                                          cache, cross)
        xla_cache = cache
        last = first[:, None]
        for i in range(3):
            pos = jnp.int32(P + i)
            ref_logits, xla_cache = _xla_step(params, cfg, cross, last,
                                              pos, xla_cache)
            got_logits, ho_cache = step(last, pos, ho_cache)
            np.testing.assert_allclose(np.asarray(got_logits),
                                       np.asarray(ref_logits),
                                       rtol=1e-4, atol=1e-4)
            nxt = jnp.argmax(ref_logits[:, -1, :], axis=-1)
            assert (np.asarray(jnp.argmax(got_logits[:, -1, :], axis=-1))
                    == np.asarray(nxt)).all()
            last = nxt[:, None].astype(jnp.int32)

    def test_bf16_step_close(self, setup):
        cfg, params, enc, cross, prompt, cache, first = setup
        from whisper_tpu.weights import to_device
        bcfg = cfg.replace(compute_dtype="bfloat16", fused_step=True)
        bparams = to_device(params, jnp.bfloat16)
        bcross = precompute_cross_kv(bparams, bcfg, enc.astype(jnp.bfloat16))
        bcache = init_kv_cache(bcfg, prompt.shape[0], dtype=jnp.bfloat16)
        logits_p, bcache = decoder_forward(bparams, bcfg, prompt,
                                           jnp.int32(0), bcache, bcross)
        last = jnp.argmax(logits_p[:, -1, :], axis=-1)[:, None].astype(jnp.int32)
        P = prompt.shape[1]
        ref_logits, _ = _xla_step(bparams, bcfg, bcross, last,
                                  jnp.int32(P), bcache)
        step, ho_cache = _make_fused_step(bparams, bcfg, bcache, bcross)
        got_logits, _ = step(last, jnp.int32(P), ho_cache)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(ref_logits),
                                   rtol=2e-2, atol=2e-2)


class TestGreedyEndToEnd:
    def test_greedy_tokens_identical(self, setup):
        """Full greedy_decode with fused_step forced vs the XLA path:
        token-identical (fp32, reference backend)."""
        cfg, params, enc, cross, prompt, cache, first = setup
        ref = greedy_decode(params, cfg.replace(fused_step=False), enc,
                            prompt, max_new=8)
        got = greedy_decode(params, cfg.replace(fused_step=True), enc,
                            prompt, max_new=8)
        assert (np.asarray(got.tokens) == np.asarray(ref.tokens)).all()
        assert (np.asarray(got.lengths) == np.asarray(ref.lengths)).all()
        np.testing.assert_allclose(np.asarray(got.sum_logprobs),
                                   np.asarray(ref.sum_logprobs),
                                   rtol=1e-4, atol=1e-4)


class TestBlockedWeights:
    """Multi-block weight streaming (n_qkv > 1, n_mlp > 1) — the path that
    lets the kernel compile at large-v3-turbo dims (VERDICT r2 #5), forced
    via the env block overrides on the nano config. Dh=32 -> Dhp=128,
    3*H*Dhp=768: blkq=384 gives n_qkv=2; ff=256: blkm=128 gives n_mlp=2."""

    def test_blocked_matches_single_block(self, setup, monkeypatch):
        cfg, params, enc, cross, prompt, cache, first = setup
        P = prompt.shape[1]
        last = first[:, None]
        ref_logits, ref_cache = _xla_step(params, cfg, cross, last,
                                          jnp.int32(P), cache)
        monkeypatch.setenv("WHISPER_TPU_FUSED_BLKQ", "384")
        monkeypatch.setenv("WHISPER_TPU_FUSED_BLKM", "128")
        step, ho_cache = _make_fused_step(params, cfg.replace(fused_step=True),
                                          cache, cross)
        got_logits, got_cache = step(last, jnp.int32(P), ho_cache)
        np.testing.assert_allclose(np.asarray(got_logits),
                                   np.asarray(ref_logits),
                                   rtol=1e-4, atol=1e-4)
        back = from_head_outer(got_cache["k"], batch=last.shape[0])
        np.testing.assert_allclose(np.asarray(back),
                                   np.asarray(ref_cache["k"]),
                                   rtol=1e-4, atol=1e-5)


def test_head_outer_round_trip(small_cfg):
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 2, 5, 4))
    back = from_head_outer(to_head_outer(x), batch=3)
    assert (np.asarray(back) == np.asarray(x)).all()
