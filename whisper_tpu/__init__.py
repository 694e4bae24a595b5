"""whisper_tpu — a TPU-native Whisper inference framework (JAX/XLA/Pallas).

A from-scratch rebuild of the capabilities of the reference CPU engine
(antonvice/whisper.Mojo): load weights -> log-mel spectrogram -> transformer
encoder -> KV-cached incremental greedy decode -> detokenize, designed
TPU-first: static shapes, jit-compiled on-device decode loops, MXU-shaped
matmuls, Pallas kernels for the hot attention paths, and jax.sharding meshes
for multi-chip scaling.

Reference parity map (see SURVEY.md):
  - config.py      <- reference config.mojo + WhisperConfig (whisper.mojo:15-31)
  - audio.py       <- reference export_weights.py:94-121 (offline mel) made on-device
  - weights.py     <- reference export_weights.py:17-92 + loader.mojo
  - models/        <- reference whisper.mojo + layers.mojo
  - decode.py      <- reference whisper.mojo:170-223 (transcribe loop)
  - tokenizer.py   <- reference tokenizer.mojo
  - ops/           <- reference whisper_tensor.mojo (hand-SIMD kernels -> XLA/Pallas)
  - parallel/      <- no reference equivalent (reference is single-CPU); mesh/sharding
"""

from whisper_tpu.config import WhisperConfig, CONFIGS, get_config

__version__ = "0.2.0"
__all__ = ["WhisperConfig", "CONFIGS", "get_config", "WhisperPipeline",
           "BatchedTranscriber", "ContinuousBatcher", "LongFormDriver",
           "ShardedPipeline",
           "TranscriptionServer", "Tokenizer", "DecodeOptions",
           "speculative_decode", "spec_transcribe_window",
           "__version__"]

_LAZY = {
    # Lazy imports keep `import whisper_tpu` cheap (these pull in jax).
    "WhisperPipeline": ("whisper_tpu.pipeline", "WhisperPipeline"),
    "BatchedTranscriber": ("whisper_tpu.serving", "BatchedTranscriber"),
    "ContinuousBatcher": ("whisper_tpu.serving_continuous",
                          "ContinuousBatcher"),
    "LongFormDriver": ("whisper_tpu.serving_longform", "LongFormDriver"),
    "ShardedPipeline": ("whisper_tpu.parallel.inference", "ShardedPipeline"),
    "TranscriptionServer": ("whisper_tpu.server", "TranscriptionServer"),
    "Tokenizer": ("whisper_tpu.tokenizer", "Tokenizer"),
    "DecodeOptions": ("whisper_tpu.decode_rules", "DecodeOptions"),
    "speculative_decode": ("whisper_tpu.speculative", "speculative_decode"),
    "spec_transcribe_window": ("whisper_tpu.speculative",
                               "spec_transcribe_window"),
}


def __getattr__(name):
    if name in _LAZY:
        import importlib
        mod, attr = _LAZY[name]
        return getattr(importlib.import_module(mod), attr)
    raise AttributeError(name)
