"""Audio frontend parity vs transformers.WhisperFeatureExtractor — the
contract under which the reference's sample_input.bin was produced
(reference export_weights.py:94-121)."""

import numpy as np
import pytest

from whisper_tpu.audio import log_mel_spectrogram, mel_filter_bank, pad_or_trim
from whisper_tpu.config import get_config


def _test_audio(n_samples, rate, seed=0):
    rng = np.random.RandomState(seed)
    t = np.arange(n_samples) / rate
    return (0.5 * np.sin(2 * np.pi * 440 * t)
            + 0.25 * np.sin(2 * np.pi * 1337 * t + 0.3)
            + 0.05 * rng.randn(n_samples)).astype(np.float32)


@pytest.mark.parametrize("n_mels", [80, 128])
def test_mel_filterbank_matches_hf(n_mels):
    hf_audio_utils = pytest.importorskip("transformers.audio_utils")
    ref = hf_audio_utils.mel_filter_bank(
        num_frequency_bins=201, num_mel_filters=n_mels, min_frequency=0.0,
        max_frequency=8000.0, sampling_rate=16000, norm="slaney",
        mel_scale="slaney")                       # (n_freqs, n_mels)
    mine = mel_filter_bank(201, n_mels, 16000)    # (n_mels, n_freqs)
    np.testing.assert_allclose(mine, ref.T, atol=1e-7)


@pytest.mark.parametrize("model,n_mels", [("tiny", 80), ("large-v3", 128)])
def test_log_mel_matches_hf(model, n_mels):
    transformers = pytest.importorskip("transformers")
    cfg = get_config(model)
    audio = _test_audio(cfg.n_samples, cfg.sample_rate)
    fe = transformers.WhisperFeatureExtractor(feature_size=n_mels)
    ref = fe(audio, sampling_rate=16000, return_tensors="np").input_features[0]
    mine = np.asarray(log_mel_spectrogram(audio[None], cfg))[0]
    assert mine.shape == (n_mels, cfg.n_frames)
    assert np.abs(ref - mine).max() < 1e-4


def test_log_mel_batched():
    cfg = get_config("tiny")
    a = np.stack([_test_audio(cfg.n_samples, cfg.sample_rate, s) for s in (0, 1)])
    batched = np.asarray(log_mel_spectrogram(a, cfg))
    singles = np.stack([np.asarray(log_mel_spectrogram(x[None], cfg))[0]
                        for x in a])
    # per-sample normalization must be independent of batch composition
    np.testing.assert_allclose(batched, singles, atol=1e-6)


def test_pad_or_trim():
    cfg = get_config("tiny")
    short = np.ones(1000, np.float32)
    out = pad_or_trim(short, cfg.n_samples)
    assert out.shape == (cfg.n_samples,)
    assert out[:1000].sum() == 1000 and out[1000:].sum() == 0
    long = np.ones(cfg.n_samples + 5, np.float32)
    assert pad_or_trim(long, cfg.n_samples).shape == (cfg.n_samples,)
