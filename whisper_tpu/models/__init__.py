"""Model layer: pure-functional Whisper encoder/decoder over params pytrees.

Replaces the reference's model layer (whisper.mojo: WhisperEncoder :34-99,
WhisperDecoder :102-167, Whisper :170-223) and NN-module layer (layers.mojo:
MultiHeadAttention :72-383, ResidualAttentionBlock :386-551, KVCache :14-69).
"""

from whisper_tpu.models.whisper import (
    decoder_forward,
    encoder_forward,
    init_kv_cache,
    init_params,
    precompute_cross_kv,
)
