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


def test_vad_skips_silent_windows(nano_pipe, small_cfg):
    """Energy VAD: a long clip whose middle window is silence produces
    transcripts only for the voiced windows — and the silent window costs
    zero decode calls (observable as one fewer SOT in the output)."""
    sr = small_cfg.sample_rate
    w = small_cfg.n_samples
    voiced = (0.2 * np.sin(2 * np.pi * 330 * np.arange(w) / sr)
              ).astype(np.float32)
    silent = np.zeros(w, np.float32)
    audio = np.concatenate([voiced, silent, voiced])
    r = nano_pipe.transcribe(audio, max_new=4, vad_threshold_db=-40.0)
    assert r.tokens.count(small_cfg.sot_token) == 2
    # all-silence input: no windows decoded at all
    r2 = nano_pipe.transcribe(silent, max_new=4, vad_threshold_db=-40.0)
    assert r2.tokens == [] and r2.text == ""


def test_energy_vad_unit():
    from whisper_tpu.audio import energy_vad
    sr = 16000
    t = np.arange(sr) / sr
    assert energy_vad((0.1 * np.sin(2 * np.pi * 220 * t)).astype(np.float32))
    assert not energy_vad(np.zeros(sr, np.float32))
    assert not energy_vad(np.zeros(0, np.float32))
    # quiet noise below -40 dBFS is not speech
    assert not energy_vad(
        (np.random.RandomState(0).randn(sr) * 1e-4).astype(np.float32))
    # a short loud clip (< min_speech_frames full 30 ms frames, e.g. the
    # trailing window of a long file) still classifies as speech
    t60 = np.arange(int(sr * 0.06)) / sr
    assert energy_vad((0.1 * np.sin(2 * np.pi * 220 * t60)).astype(np.float32))
    assert not energy_vad(np.zeros(int(sr * 0.06), np.float32))


def test_alignment_heads_sidecar(tmp_path):
    """load/find_alignment_heads: bare list and HF generation_config.json
    forms, plus auto-detection next to a checkpoint path."""
    import json
    from whisper_tpu.alignment import (find_alignment_heads,
                                       load_alignment_heads)
    bare = tmp_path / "alignment_heads.json"
    bare.write_text(json.dumps([[2, 1], [3, 0]]))
    assert load_alignment_heads(str(bare)) == [(2, 1), (3, 0)]

    gen = tmp_path / "generation_config.json"
    gen.write_text(json.dumps({"alignment_heads": [[1, 4]]}))
    assert load_alignment_heads(str(gen)) == [(1, 4)]

    # auto-detect prefers alignment_heads.json over generation_config.json
    found = find_alignment_heads(str(tmp_path / "model.npz"))
    assert found == [(2, 1), (3, 0)]

    bad = tmp_path / "bad.json"
    bad.write_text("{}")
    with pytest.raises(ValueError):
        load_alignment_heads(str(bad))


def test_find_alignment_heads_absent(tmp_path):
    from whisper_tpu.alignment import find_alignment_heads
    assert find_alignment_heads(str(tmp_path / "model.npz")) is None
