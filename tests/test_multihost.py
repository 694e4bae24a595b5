"""Multi-host glue (parallel/multihost.py) — single-process degenerate
behavior on the virtual mesh (real multi-process needs a pod; the compute
path is process-count-independent by construction)."""

import jax
import numpy as np
import pytest

from whisper_tpu.parallel.mesh import make_mesh
from whisper_tpu.parallel.multihost import (
    global_batch,
    global_batch_size,
    initialize,
    is_coordinator,
)


def test_initialize_single_process_noop():
    initialize()                      # must not raise or hang
    assert jax.process_count() == 1
    assert is_coordinator()


def test_global_batch_shards_on_dp():
    mesh = make_mesh(dp=2, tp=4)
    rows = np.arange(2 * 5 * 3, dtype=np.float32).reshape(2, 5, 3)
    arr = global_batch(rows, mesh)
    assert arr.shape == rows.shape
    np.testing.assert_array_equal(np.asarray(arr), rows)
    # sharded over dp on axis 0
    assert arr.sharding.spec[0] == "dp"


def test_global_batch_size():
    assert global_batch_size(4) == 4 * jax.process_count()


def test_global_batch_feeds_sharded_pipeline(small_cfg):
    """The assembled global batch drives the jitted sharded path."""
    from whisper_tpu.models.whisper import encoder_forward, init_params
    from whisper_tpu.parallel.mesh import shard_params
    from whisper_tpu.audio import log_mel_spectrogram

    params = init_params(small_cfg, jax.random.PRNGKey(0))
    mesh = make_mesh(dp=2, tp=4)
    sp = shard_params(params, mesh)
    audio = np.random.RandomState(0).randn(
        2, small_cfg.sample_rate).astype(np.float32) * 0.1
    pad = np.zeros((2, small_cfg.n_samples), np.float32)
    pad[:, :audio.shape[1]] = audio
    arr = global_batch(pad, mesh)
    enc = jax.jit(lambda p, a: encoder_forward(
        p, small_cfg, log_mel_spectrogram(a, small_cfg)))(sp, arr)
    assert enc.shape == (2, small_cfg.n_audio_ctx, small_cfg.d_model)
