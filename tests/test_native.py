"""Native runtime library (C++/ctypes) vs pure-Python fallbacks.

Skipped wholesale when g++ is unavailable (the fallbacks are covered by the
other suites)."""

import io
import wave

import numpy as np
import pytest

from whisper_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library not built")


def _wav_bytes(x: np.ndarray, rate: int, channels: int = 1,
               width: int = 2) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(width)
        w.setframerate(rate)
        if width == 2:
            data = (np.clip(x, -1, 1) * 32767).astype("<i2")
        elif width == 1:
            data = (np.clip(x, -1, 1) * 127 + 128).astype(np.uint8)
        elif width == 4:
            data = (np.clip(x, -1, 1) * 2147483647).astype("<i4")
        w.writeframes(data.tobytes())
    return buf.getvalue()


def test_decode_wav_mono16_roundtrip():
    rng = np.random.RandomState(0)
    x = (rng.randn(8000) * 0.2).astype(np.float32)
    y, rate = native.decode_wav(_wav_bytes(x, 16_000))
    assert rate == 16_000 and len(y) == len(x)
    assert np.abs(y - np.clip(x, -1, 1)).max() < 2 / 32768


def test_decode_wav_stereo_mixdown_matches_python():
    rng = np.random.RandomState(1)
    L = (rng.randn(4000) * 0.2).astype(np.float32)
    R = (rng.randn(4000) * 0.2).astype(np.float32)
    inter = np.empty(8000, np.float32)
    inter[0::2], inter[1::2] = L, R
    y, rate = native.decode_wav(_wav_bytes(inter, 22_050, channels=2))
    ref = ((np.clip(L, -1, 1) * 32767).astype("<i2") / 32768.0
           + (np.clip(R, -1, 1) * 32767).astype("<i2") / 32768.0) / 2
    assert np.abs(y - ref).max() < 1e-6


def test_decode_wav_widths():
    x = np.sin(2 * np.pi * 440 * np.arange(4000) / 16000).astype(np.float32) * 0.5
    for width in (1, 2, 4):
        y, rate = native.decode_wav(_wav_bytes(x, 16_000, width=width))
        tol = {1: 1 / 64, 2: 1 / 8192, 4: 1e-6}[width]
        assert np.abs(y - x).max() < tol, f"width={width}"


def test_decode_wav_rejects_garbage():
    with pytest.raises(ValueError):
        native.decode_wav(b"not a wav file at all........................")


def test_resample_preserves_tone():
    rate_in, rate_out, f0 = 44_100, 16_000, 440.0
    t = np.arange(rate_in) / rate_in
    x = np.sin(2 * np.pi * f0 * t).astype(np.float32)
    y = native.resample(x, rate_in, rate_out)
    assert abs(len(y) - rate_out) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = np.fft.rfftfreq(len(y), 1 / rate_out)[np.argmax(spec)]
    assert abs(peak - f0) < 2.0
    # amplitude roughly preserved (windowed-sinc, not decimation)
    assert 0.9 < np.abs(y[1000:-1000]).max() < 1.1


def test_resample_identity():
    x = np.random.RandomState(2).randn(1000).astype(np.float32)
    y = native.resample(x, 16_000, 16_000)
    np.testing.assert_array_equal(x, y)


def test_native_detokenizer_matches_python(tiny_cfg):
    from whisper_tpu.tokenizer import Tokenizer
    vocab = "whisper_tpu/assets/vocab.txt"
    nd = native.NativeDetokenizer(vocab)
    pt = Tokenizer(vocab)
    assert nd.vocab_size == pt.vocab_size
    rng = np.random.RandomState(3)
    for _ in range(20):
        ids = rng.randint(0, pt.vocab_size, size=30).tolist()
        assert nd.decode(ids) == pt.decode(ids)
        assert nd.decode(ids, reference_mode=True) == pt.decode_reference(ids)


def test_mapped_weights_zero_copy_matches_read(tmp_path):
    rng = np.random.RandomState(4)
    data = rng.randn(1000).astype("<f4")
    p = tmp_path / "w.bin"
    p.write_bytes(data.tobytes())
    with native.MappedWeights(str(p)) as m:
        np.testing.assert_array_equal(np.asarray(m.floats), data)


def test_flat_bin_path_loader(tmp_path, tiny_cfg):
    """End-to-end: to_flat_bin -> mmap load -> same pytree."""
    import jax
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.weights import from_flat_bin_path, to_flat_bin

    cfg = tiny_cfg.replace(name="nano", d_model=64, n_heads=2,
                           n_audio_layers=1, n_text_layers=1,
                           n_audio_ctx=8, n_text_ctx=8, vocab_size=256,
                           n_mels=4, eot_token=250, n_languages=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    p = tmp_path / "w.bin"
    p.write_bytes(to_flat_bin(params, cfg))
    loaded = from_flat_bin_path(str(p), cfg)
    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(loaded)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)


def test_load_audio_end_to_end(tmp_path):
    t = np.arange(22050 * 2) / 22050.0
    x = (0.3 * np.sin(2 * np.pi * 330 * t)).astype(np.float32)
    p = tmp_path / "a.wav"
    p.write_bytes(_wav_bytes(x, 22_050))
    y = native.load_audio(str(p), 16_000)
    assert abs(len(y) - 32_000) <= 1
    spec = np.abs(np.fft.rfft(y * np.hanning(len(y))))
    peak = np.fft.rfftfreq(len(y), 1 / 16_000)[np.argmax(spec)]
    assert abs(peak - 330.0) < 2.0


def test_decode_wav_truncated_fmt_chunk_rejected():
    """A fmt chunk whose declared length runs past EOF must error (-1), not
    read out of bounds."""
    good = _wav_bytes(np.zeros(16, np.float32), 16_000)
    # keep RIFF/WAVE + the fmt chunk *header* but cut the body short
    truncated = good[:22]          # 12-byte RIFF header + 8-byte hdr + 2 bytes
    with pytest.raises(ValueError):
        native.decode_wav(truncated)


def test_decode_wav_fmt_len_overruns_buffer_rejected():
    """fmt length field forged to exceed the buffer must error cleanly."""
    good = bytearray(_wav_bytes(np.zeros(16, np.float32), 16_000))
    # fmt chunk starts at offset 12; its len field is at 16..19
    assert good[12:16] == b"fmt "
    good[16:20] = (10_000_000).to_bytes(4, "little")
    with pytest.raises(ValueError):
        native.decode_wav(bytes(good))
