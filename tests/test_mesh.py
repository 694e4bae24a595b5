"""Mesh construction and sharding-spec sanitation."""

import numpy as np
import jax
import pytest
from jax.sharding import PartitionSpec as P

from whisper_tpu.parallel.mesh import (
    activation_shardings,
    make_mesh,
    param_pspecs,
    sanitize_pspec,
    shard_params,
)


def test_make_mesh_axes():
    m = make_mesh(dp=2, sp=2, tp=2)
    assert m.axis_names == ("dp", "sp", "tp")
    assert m.shape == {"dp": 2, "sp": 2, "tp": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)           # 6 != 8 devices


def test_sanitize_pspec_drops_indivisible_axes():
    mesh = make_mesh(dp=2, tp=4)
    # 51865 % 4 != 0 -> vocab axis replicated; 384 % 4 == 0 -> kept
    assert sanitize_pspec((51865, 64), P("tp", None), mesh) == P(None, None)
    assert sanitize_pspec((128, 384), P(None, "tp"), mesh) == P(None, "tp")
    # tuple axes: ("dp","tp") size 8 divides 64
    assert sanitize_pspec((64, 3), P(("dp", "tp"), None), mesh) == \
        P(("dp", "tp"), None)
    # short spec is padded with None; divisible leading axis is kept
    assert sanitize_pspec((8, 8, 8), P("tp"), mesh) == P("tp", None, None)
    assert sanitize_pspec((9, 8, 8), P("tp"), mesh) == P(None, None, None)


def test_param_pspecs_shapes(small_cfg):
    from whisper_tpu.models.whisper import init_params
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    specs = param_pspecs(params)
    assert specs["decoder"]["tok_emb"] == P("tp", None)
    assert specs["encoder"]["layers"]["fc1"]["w"] == P(None, None, "tp")
    assert specs["encoder"]["layers"]["fc2"]["w"] == P(None, "tp", None)
    assert specs["encoder"]["layers"]["attn"]["o"]["w"] == P(None, "tp", None)


def test_shard_params_places_on_mesh(small_cfg):
    from whisper_tpu.models.whisper import init_params
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=4, tp=2)
    sharded = shard_params(params, mesh)
    fc1 = sharded["encoder"]["layers"]["fc1"]["w"]
    assert "tp" in str(fc1.sharding.spec)
    # vocab (51865) indivisible by 2 -> PADDED to a divisible row count and
    # genuinely row-sharded (the 51k-logit matmul splits over tp)
    tok = sharded["decoder"]["tok_emb"]
    assert tok.sharding.spec == P("tp", None)
    assert tok.shape[0] % (2 * 128) == 0 and tok.shape[0] >= 51865
    # pad rows are exact zeros (inert under the tied-logit matmul)
    assert not np.asarray(tok[51865:]).any()


def test_padded_vocab_rows():
    from whisper_tpu.parallel.mesh import padded_vocab_rows
    for tp in (2, 4, 8):
        for v in (51_865, 51_864, 51_866):
            rows = padded_vocab_rows(v, tp)
            assert rows >= v and rows % (tp * 128) == 0
    assert padded_vocab_rows(51_865, 4) == 52_224


def test_vocab_padding_preserves_logits(small_cfg):
    """tp-sharded (padded-vocab) prefill logits == unsharded, exact shape
    (the pad logits are sliced off inside final_logits)."""
    import jax.numpy as jnp
    from whisper_tpu.models.whisper import (
        decoder_forward, init_kv_cache, init_params, precompute_cross_kv)
    from whisper_tpu.tokenizer import build_prompt
    from jax.sharding import NamedSharding
    cfg = small_cfg
    params = init_params(cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(5)
    enc = jnp.asarray(rng.randn(2, cfg.n_audio_ctx, cfg.d_model) * 0.3,
                      jnp.float32)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)

    def prefill(p, e, pr):
        cross = precompute_cross_kv(p, cfg, e)
        cache = init_kv_cache(cfg, 2)
        logits, _ = decoder_forward(p, cfg, pr, jnp.int32(0), cache, cross)
        return logits

    ref = np.asarray(jax.jit(prefill)(params, enc, prompt))
    mesh = make_mesh(dp=1, tp=4, devices=jax.devices()[:4])
    sp = shard_params(params, mesh)
    got = np.asarray(jax.jit(prefill)(
        sp, jax.device_put(enc, NamedSharding(mesh, P())),
        jax.device_put(prompt, NamedSharding(mesh, P()))))
    assert got.shape == ref.shape == (2, prompt.shape[1], cfg.vocab_size)
    np.testing.assert_allclose(got, ref, atol=5e-3, rtol=1e-4)


def test_activation_shardings_sp_aware():
    m3 = make_mesh(dp=2, sp=2, tp=2)
    sh = activation_shardings(m3)
    assert sh["mel"].spec == P("dp", None, "sp")
    assert sh["enc_out"].spec == P("dp", "sp", None)
