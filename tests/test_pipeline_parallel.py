"""Pipeline parallelism (GPipe over the stacked-layer axis): exactness vs
the unsharded scan, composition with dp/tp on one mesh, and the pipelined
train step on the full 4-axis mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
from whisper_tpu.parallel.mesh import make_mesh, shard_params
from whisper_tpu.parallel.pipeline_parallel import (
    decoder_logits_pp,
    encoder_forward_pp,
    loss_fn_pp,
    pipelined_scan,
    train_step_pp,
)
from whisper_tpu.train import TrainBatch, loss_fn, make_optimizer


@pytest.fixture(scope="module")
def nano():
    from whisper_tpu.config import get_config
    cfg = get_config("tiny").replace(
        name="pp-nano", d_model=64, n_heads=4,
        n_audio_layers=4, n_text_layers=4,
        n_audio_ctx=32, n_text_ctx=16, vocab_size=512,
        eot_token=500, n_languages=8,
    )
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def test_pipelined_scan_matches_scan_exactly():
    mesh = make_mesh(dp=2, tp=2, pp=2)
    L, B, T, D = 4, 8, 3, 16
    Ws = jax.random.normal(jax.random.PRNGKey(0), (L, D, D)) * 0.3
    h = jax.random.normal(jax.random.PRNGKey(1), (B, T, D))

    def block(x, W):
        return jnp.tanh(x @ W)

    want, _ = jax.lax.scan(lambda c, W: (block(c, W), None), h, Ws)
    for m in (2, 4, 8):
        got = pipelined_scan(block, h, Ws, mesh, microbatches=m)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pipelined_scan_pytree_state_passthrough():
    """Carried state is a pytree; untouched leaves ride through unchanged."""
    mesh = make_mesh(pp=8)
    L, B, D = 8, 4, 8
    Ws = jax.random.normal(jax.random.PRNGKey(2), (L, D, D)) * 0.2
    h = jax.random.normal(jax.random.PRNGKey(3), (B, D))
    aux = jax.random.normal(jax.random.PRNGKey(4), (B, 3))

    def block(st, W):
        return {"h": jnp.tanh(st["h"] @ W), "aux": st["aux"]}

    out = pipelined_scan(block, {"h": h, "aux": aux}, Ws, mesh,
                         microbatches=4)
    want, _ = jax.lax.scan(
        lambda c, W: (jnp.tanh(c @ W), None), h, Ws)
    # microbatch matmuls may tile differently than the full-batch ones
    np.testing.assert_allclose(np.asarray(out["h"]), np.asarray(want),
                               atol=1e-6)
    np.testing.assert_array_equal(np.asarray(out["aux"]), np.asarray(aux))


def test_pipelined_scan_rejects_indivisible():
    mesh = make_mesh(pp=8)
    Ws = jnp.zeros((6, 4, 4))                 # 6 layers, pp=8
    h = jnp.zeros((4, 4))
    with pytest.raises(ValueError, match="not divisible"):
        pipelined_scan(lambda x, w: x, h, Ws, mesh)


def test_encoder_pp_matches_unsharded(nano):
    cfg, params = nano
    mesh = make_mesh(dp=2, tp=2, pp=2)
    mel = jax.random.normal(jax.random.PRNGKey(5),
                            (4, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.5
    want = encoder_forward(params, cfg, mel)
    sharded = shard_params(params, mesh)
    got = jax.jit(encoder_forward_pp,
                  static_argnames=("cfg", "mesh", "microbatches"))(
        sharded, cfg, mel, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_decoder_pp_matches_unsharded(nano):
    cfg, params = nano
    mesh = make_mesh(pp=4, dp=2)
    B, T = 4, 8
    mel = jax.random.normal(jax.random.PRNGKey(6),
                            (B, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    tokens = jax.random.randint(jax.random.PRNGKey(7), (B, T), 0,
                                cfg.vocab_size, jnp.int32)
    cache = init_kv_cache(cfg, B)
    cross = precompute_cross_kv(params, cfg, enc)
    want, _ = decoder_forward(params, cfg, tokens, jnp.int32(0), cache, cross)
    sharded = shard_params(params, mesh)
    got = jax.jit(decoder_logits_pp,
                  static_argnames=("cfg", "mesh", "microbatches"))(
        sharded, cfg, tokens, enc, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-4, rtol=1e-5)


def test_train_step_pp_four_axis_mesh(nano):
    """The full pipelined training step runs on a dp x sp x tp x pp mesh and
    its loss equals the unsharded loss_fn."""
    cfg, params = nano
    mesh = make_mesh(dp=1, sp=1, tp=2, pp=4)
    B = 4
    batch = TrainBatch(
        mel=jax.random.normal(jax.random.PRNGKey(8),
                              (B, cfg.n_mels, 2 * cfg.n_audio_ctx)) * 0.5,
        tokens=jax.random.randint(jax.random.PRNGKey(9),
                                  (B, cfg.n_text_ctx), 0, cfg.vocab_size,
                                  jnp.int32),
        loss_mask=jnp.ones((B, cfg.n_text_ctx), jnp.float32),
    )
    want = float(loss_fn(params, cfg, batch))
    sharded = shard_params(params, mesh)
    got = float(jax.jit(loss_fn_pp,
                        static_argnames=("cfg", "mesh", "microbatches"))(
        sharded, cfg, batch, mesh, microbatches=2))
    assert abs(got - want) < 1e-4 * max(1.0, abs(want))

    optimizer = make_optimizer()
    opt_state = optimizer.init(sharded)
    step = jax.jit(train_step_pp,
                   static_argnames=("cfg", "optimizer", "mesh",
                                    "microbatches"))
    new_params, _, metrics = step(sharded, opt_state, cfg, batch, optimizer,
                                  mesh, microbatches=2)
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params actually moved and kept their pp sharding
    qw = new_params["decoder"]["layers"]["attn"]["q"]["w"]
    assert "pp" in str(qw.sharding.spec)
