"""Pipeline + CLI smoke tests (random weights, synthetic audio)."""

import subprocess
import sys
import wave

import numpy as np
import pytest


@pytest.fixture(scope="module")
def nano_pipe(small_cfg):
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.pipeline import WhisperPipeline
    import jax
    return WhisperPipeline(small_cfg, init_params(small_cfg, jax.random.PRNGKey(0)))


def test_transcribe_window(nano_pipe):
    audio = np.sin(np.linspace(0, 1000, 16000 * 3)).astype(np.float32)
    r = nano_pipe.transcribe_window(audio, max_new=5)
    assert isinstance(r.text, str)
    assert r.tokens[:4] == [50258, 50259, 50359, 50363]
    assert set(r.timings) == {"mel_s", "decode_s", "detok_s", "total_s"}


def test_transcribe_long_form(nano_pipe, small_cfg):
    # 70 s of audio -> 3 windows
    audio = np.sin(np.linspace(0, 9000, 16000 * 70)).astype(np.float32)
    r = nano_pipe.transcribe(audio, language="en", max_new=5)
    assert r.tokens.count(small_cfg.sot_token) == 3


def test_load_wav_resample(tmp_path):
    from whisper_tpu.pipeline import load_wav
    path = str(tmp_path / "t.wav")
    rate = 44_100
    x = (np.sin(np.linspace(0, 400, rate)) * 20000).astype(np.int16)
    stereo = np.stack([x, x], axis=1)
    with wave.open(path, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(stereo.tobytes())
    y = load_wav(path, 16_000)
    assert abs(len(y) - 16_000) <= 1
    assert np.abs(y).max() <= 1.0


def test_cli_random_weights(tmp_path):
    """CLI end-to-end with --random-weights on a tiny synthetic wav."""
    path = str(tmp_path / "t.wav")
    x = (np.sin(np.linspace(0, 400, 16_000)) * 20000).astype(np.int16)
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16_000)
        w.writeframes(x.tobytes())
    out = subprocess.run(
        [sys.executable, "-m", "whisper_tpu.cli", "--random-weights",
         "--audio", path, "--max-new", "4", "--model", "tiny"],
        capture_output=True, text=True, timeout=600,
        env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"})
    assert out.returncode == 0, out.stderr
    assert "tokens:" in out.stdout
