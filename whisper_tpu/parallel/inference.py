"""Multi-chip inference: dp x tp sharded transcription.

The reference is strictly single-CPU (SURVEY.md §2.6); this module scales
inference across a TPU slice the XLA way: annotate shardings, jit once, let
GSPMD insert the ICI collectives.

  * dp (data parallel): the batch dim of audio/mel/prompt/KV-cache — linear
    throughput scaling for batched serving.
  * tp (tensor parallel): Megatron-style within every block (QKV/fc1
    column-sharded, out-proj/fc2 row-sharded, vocab embedding row-sharded so
    the 51k-logit matmul splits). Latency scaling for Large-v3.

Usage:
    sp = ShardedPipeline(params, "large-v3", dp=2, tp=4)   # 8 chips
    result = sp.transcribe_batch(audio_batch)              # (B,) texts
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from whisper_tpu.audio import log_mel_spectrogram, pad_or_trim
from whisper_tpu.config import WhisperConfig, get_config
from whisper_tpu.decode import DecodeResult, greedy_decode
from whisper_tpu.decode_rules import DecodeOptions
from whisper_tpu.models.whisper import encoder_forward
from whisper_tpu.parallel.mesh import make_mesh, shard_params
from whisper_tpu.tokenizer import Tokenizer, build_prompt


@functools.partial(jax.jit,
                   static_argnames=("cfg", "max_new", "opts", "enc_sharding"))
def _transcribe_sharded(params, cfg: WhisperConfig, audio: jax.Array,
                        prompt: jax.Array,
                        max_new: Optional[int] = None,
                        opts: Optional[DecodeOptions] = None,
                        enc_sharding=None) -> DecodeResult:
    """audio (B, n_samples) -> tokens, entirely on the mesh. The input
    shardings (params tp-sharded, audio/prompt dp-sharded) steer GSPMD;
    intermediate activations inherit batch sharding, weights stay
    tp-sharded, and psums ride ICI. enc_sharding (a NamedSharding) pins the
    encoder output layout — P(dp, sp, None) activates sequence-parallel
    encoding; GSPMD inserts the K/V all-gathers attention needs."""
    mel = log_mel_spectrogram(audio, cfg)
    enc = encoder_forward(params, cfg, mel)
    if enc_sharding is not None:
        enc = jax.lax.with_sharding_constraint(enc, enc_sharding)
    return greedy_decode(params, cfg, enc, prompt, max_new=max_new, opts=opts)


class ShardedPipeline:
    """Transcription over a (dp, tp) mesh. Batch must be a multiple of dp;
    n_heads and d_ff must divide by tp (true for every family member with
    tp in {1, 2, 4} and most with 8)."""

    def __init__(self, params, cfg: WhisperConfig | str, dp: int = 1,
                 tp: int = 1, sp: int = 1,
                 devices: Optional[Sequence] = None,
                 tokenizer: Optional[Tokenizer] = None):
        self.cfg = get_config(cfg) if isinstance(cfg, str) else cfg
        if self.cfg.n_heads % tp:
            raise ValueError(f"tp={tp} must divide n_heads={self.cfg.n_heads}")
        self.mesh = make_mesh(dp=dp, tp=tp, sp=sp,
                              devices=list(devices) if devices else None)
        self.dp, self.tp, self.sp = dp, tp, sp
        self.params = shard_params(params, self.mesh)
        self.tokenizer = tokenizer or Tokenizer(config=self.cfg)
        self.enc_sharding = (NamedSharding(self.mesh, P("dp", "sp", None))
                             if sp > 1 else None)

    def _shard_batch(self, x: np.ndarray, spec: P) -> jax.Array:
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def transcribe_batch(self, audio: np.ndarray,
                         language: str = "en", task: str = "transcribe",
                         max_new: Optional[int] = None,
                         opts: Optional[DecodeOptions] = None) -> list[dict]:
        """audio: (B, <=n_samples) float32, B % dp == 0. Returns per-row
        {"text", "tokens"}."""
        cfg = self.cfg
        audio = np.asarray(audio, np.float32)
        B = audio.shape[0]
        if B % self.dp:
            raise ValueError(f"batch {B} not divisible by dp={self.dp}")
        padded = np.stack([pad_or_trim(a, cfg.n_samples) for a in audio])
        prompt = np.tile(
            np.asarray(build_prompt(cfg, language, task,
                                    timestamps=bool(opts and opts.timestamps)),
                       np.int32), (B, 1))
        audio_d = self._shard_batch(padded, P("dp", None))
        prompt_d = self._shard_batch(prompt, P("dp", None))
        res = _transcribe_sharded(self.params, cfg, audio_d, prompt_d,
                                  max_new=max_new, opts=opts,
                                  enc_sharding=self.enc_sharding)
        tokens = np.asarray(res.tokens)
        lengths = np.asarray(res.lengths)
        return [{"text": self.tokenizer.decode(tokens[b, :lengths[b]]),
                 "tokens": tokens[b, :lengths[b]].tolist()}
                for b in range(B)]
