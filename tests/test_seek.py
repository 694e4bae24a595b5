"""Seek-based long-form windowing mechanics (canned windows — no model)."""

import numpy as np

from whisper_tpu.config import get_config
from whisper_tpu.decode_rules import DecodeOptions
from whisper_tpu.pipeline import Transcription, WhisperPipeline


class _FakePipe(WhisperPipeline):
    """Overrides the per-window model call with canned segment endings so
    the seek arithmetic is tested in isolation."""

    def __init__(self, cfg, endings):
        self.cfg = cfg
        self.params = None
        self.tokenizer = None
        self._endings = list(endings)
        self.offsets: list[float] = []

    def transcribe_window(self, audio, language="en", task="transcribe",
                          max_new=None, opts=None, prev_tokens=(),
                          seed=0, fallback_temperatures=(),
                          no_speech_threshold=None, word_timestamps=False,
                          window_offset_s=0.0):
        self.offsets.append(window_offset_s)
        end = self._endings.pop(0) if self._endings else None
        segments = ([{"start": window_offset_s, "end": end, "text": "x"}]
                    if end is not None else
                    [{"start": window_offset_s, "end": None, "text": "x"}])
        return Transcription(text="x", tokens=[50258],
                             timings={"mel_s": 0, "decode_s": 0,
                                      "detok_s": 0, "total_s": 0},
                             segments=segments)


def test_seek_advances_by_last_closed_segment():
    cfg = get_config("tiny")
    # 70 s of audio; first window's last segment closes at 17.5 s => the
    # second window starts there, not at 30 s
    pipe = _FakePipe(cfg, endings=[17.5, 40.0, None])
    audio = np.zeros(70 * 16_000, np.float32)
    opts = DecodeOptions(timestamps=True)
    r = pipe.transcribe(audio, opts=opts)
    assert pipe.offsets[0] == 0.0
    assert abs(pipe.offsets[1] - 17.5) < 1e-6
    # second window closed at absolute 40.0 => third starts there
    assert abs(pipe.offsets[2] - 40.0) < 1e-6
    assert len(r.segments) == 3


def test_seek_fixed_windows_without_timestamps():
    cfg = get_config("tiny")
    pipe = _FakePipe(cfg, endings=[17.5, 40.0, None])
    audio = np.zeros(70 * 16_000, np.float32)
    pipe.transcribe(audio)                        # no timestamp opts
    assert pipe.offsets == [0.0, 30.0, 60.0]


def test_seek_minimum_progress_guard():
    cfg = get_config("tiny")
    # a degenerate window that "closes" at its own start must still move
    # forward at least 1 s
    pipe = _FakePipe(cfg, endings=[0.0, 0.5, None, None])
    audio = np.zeros(40 * 16_000, np.float32)
    pipe.transcribe(audio, opts=DecodeOptions(timestamps=True))
    diffs = np.diff(pipe.offsets)
    assert (diffs >= 0.999).all()
