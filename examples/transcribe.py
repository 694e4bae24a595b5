"""Minimal transcription example.

    python examples/transcribe.py clip.wav tiny.npz [model]

Loads an npz checkpoint (see README for converting from HF), transcribes a
WAV with timestamps + word timings, and prints an SRT.
"""

import sys

sys.path.insert(0, ".")

from whisper_tpu import WhisperPipeline
from whisper_tpu.formats import to_srt
from whisper_tpu.native import load_audio


def main() -> int:
    wav_path, npz_path = sys.argv[1], sys.argv[2]
    model = sys.argv[3] if len(sys.argv) > 3 else "tiny"

    pipe = WhisperPipeline.from_npz(npz_path, model)
    audio = load_audio(wav_path, pipe.cfg.sample_rate)
    result = pipe.transcribe(
        audio,
        language="auto",
        opts=pipe.make_options(timestamps=True, suppress_nonspeech=True),
        word_timestamps=True,
        fallback_temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
        condition_on_previous=True,
    )
    print(result.text)
    if result.segments:
        print(to_srt(result.segments))
    return 0


if __name__ == "__main__":
    sys.exit(main())
