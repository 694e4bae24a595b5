"""Language detection, logprob tracking, temperature-fallback protocol."""

import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.decode import detect_language, encode, greedy_decode
from whisper_tpu.models.whisper import encoder_forward, init_params
from whisper_tpu.pipeline import WhisperPipeline, compression_ratio
from whisper_tpu.tokenizer import build_prompt


def _setup(cfg, batch=1, seed=0):
    params = init_params(cfg, jax.random.PRNGKey(seed))
    mel = jax.random.normal(jax.random.PRNGKey(seed + 1),
                            (batch, cfg.n_mels, cfg.n_frames)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    return params, mel, enc


def test_detect_language_is_distribution(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    probs = np.asarray(detect_language(params, cfg, enc))
    assert probs.shape == (1, cfg.n_languages)
    np.testing.assert_allclose(probs.sum(axis=-1), 1.0, rtol=1e-5)
    assert (probs >= 0).all()


def test_sum_logprobs_tracked_and_negative(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    res = greedy_decode(params, cfg, enc, prompt, max_new=6)
    assert res.sum_logprobs is not None
    # logprobs of chosen tokens are <= 0
    assert float(res.sum_logprobs[0]) <= 0.0
    avg = float(res.avg_logprob(prompt.shape[1])[0])
    assert avg <= 0.0
    # average over n generated tokens bounds the sum
    n = int(res.lengths[0]) - prompt.shape[1]
    np.testing.assert_allclose(avg * n, float(res.sum_logprobs[0]), rtol=1e-5)


def test_compression_ratio_flags_repetition():
    assert compression_ratio("the the the the the the the the the the") > 2.4
    assert compression_ratio("a quick brown fox jumped over a lazy dog") < 2.4
    assert compression_ratio("") == 0.0


def test_pipeline_auto_language_and_fallback(small_cfg):
    pipe = WhisperPipeline(small_cfg,
                           init_params(small_cfg, jax.random.PRNGKey(0)))
    audio = (np.random.RandomState(0).randn(16000) * 0.1).astype(np.float32)
    r = pipe.transcribe_window(audio, language="auto", max_new=4,
                               fallback_temperatures=(0.0, 0.5))
    assert isinstance(r.text, str)
    assert r.tokens[0] == small_cfg.sot_token
    # the language token chosen by detection sits in the language range
    assert (small_cfg.first_language_token <= r.tokens[1]
            < small_cfg.first_language_token + small_cfg.n_languages)


def test_encode_entry_point_matches_encoder_forward(small_cfg):
    cfg = small_cfg
    params, mel, enc = _setup(cfg)
    np.testing.assert_allclose(np.asarray(encode(params, cfg, mel)),
                               np.asarray(enc), atol=1e-5)
