"""Fine-tuning path: loss decreases under teacher forcing (the train step
is otherwise only exercised by the multi-chip dry-run)."""

import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.train import TrainBatch, loss_fn, make_optimizer, train_step


def _nano_cfg():
    from whisper_tpu.config import get_config
    return get_config("tiny").replace(
        name="train-nano", d_model=64, n_heads=2,
        n_audio_layers=1, n_text_layers=1,
        n_audio_ctx=32, n_text_ctx=16, vocab_size=512,
        eot_token=500, n_languages=4)


def test_loss_decreases_on_fixed_batch():
    cfg = _nano_cfg()
    from whisper_tpu.models.whisper import init_params
    params = init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    B = 4
    batch = TrainBatch(
        mel=jnp.asarray(rng.randn(B, cfg.n_mels, 2 * cfg.n_audio_ctx)
                        .astype(np.float32) * 0.5),
        tokens=jnp.asarray(rng.randint(0, 400, (B, cfg.n_text_ctx)),
                           jnp.int32),
        loss_mask=jnp.ones((B, cfg.n_text_ctx), jnp.float32))

    optimizer = make_optimizer(lr=1e-3, warmup_steps=1, total_steps=50)
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, opt_state):
        return train_step(params, opt_state, cfg, batch, optimizer)

    l0 = float(loss_fn(params, cfg, batch))
    for _ in range(8):
        params, opt_state, metrics = step(params, opt_state)
    l1 = float(loss_fn(params, cfg, batch))
    assert np.isfinite(l0) and np.isfinite(l1)
    assert l1 < l0 * 0.95, (l0, l1)       # memorizing a fixed batch
    assert float(metrics["grad_norm"]) > 0


def test_loss_mask_zeroes_positions():
    cfg = _nano_cfg()
    from whisper_tpu.models.whisper import init_params
    params = init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.RandomState(1)
    B = 2
    mel = jnp.asarray(rng.randn(B, cfg.n_mels, 2 * cfg.n_audio_ctx)
                      .astype(np.float32) * 0.5)
    toks = jnp.asarray(rng.randint(0, 400, (B, cfg.n_text_ctx)), jnp.int32)
    full = TrainBatch(mel, toks, jnp.ones((B, cfg.n_text_ctx), jnp.float32))
    # masking out the second half changes the loss (different positions)
    half_mask = jnp.concatenate(
        [jnp.ones((B, cfg.n_text_ctx // 2)),
         jnp.zeros((B, cfg.n_text_ctx // 2))], axis=1).astype(jnp.float32)
    half = TrainBatch(mel, toks, half_mask)
    assert abs(float(loss_fn(params, cfg, full))
               - float(loss_fn(params, cfg, half))) > 1e-6
