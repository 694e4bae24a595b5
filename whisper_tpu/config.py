"""Model configuration for the full Whisper family.

Replaces the reference's compile-time aliases (reference config.mojo:4-17) and
the runtime WhisperConfig whose only factory is tiny()
(reference whisper.mojo:15-31). Unlike the reference — which supports exactly
Whisper-Tiny — this table covers tiny..large-v3-turbo, both multilingual and
.en variants.

All shapes derived from a config are static so that everything downstream is
jit-compilable with one trace per (model, batch) pair.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class WhisperConfig:
    name: str
    # Audio frontend (reference export_weights.py:116: HF WhisperProcessor STFT)
    sample_rate: int = 16_000
    n_fft: int = 400
    hop_length: int = 160
    chunk_length_s: int = 30
    n_mels: int = 80
    # Encoder
    n_audio_ctx: int = 1500          # reference config.mojo MAX_SEQ_LEN
    d_model: int = 384               # reference config.mojo D_MODEL
    n_heads: int = 6                 # reference config.mojo N_HEADS
    n_audio_layers: int = 4          # reference config.mojo N_LAYERS
    # Decoder
    n_text_layers: int = 4
    n_text_ctx: int = 448            # reference config.mojo MAX_TOKENS
    vocab_size: int = 51_865         # reference config.mojo VOCAB_SIZE
    multilingual: bool = True
    # Numerics. fp32 + HIGHEST on the logit path preserves the reference's
    # bit-identical-token contract (readme.md:19); bf16 is the fast path.
    compute_dtype: str = "float32"
    ln_eps: float = 1e-5
    # Attention backend: None = auto (size-based choice between the Pallas
    # kernels and XLA attention on TPU, XLA reference elsewhere);
    # "reference" | "pallas" | "pallas_interpret" to force.
    attn_backend: Optional[str] = None
    # int8 KV cache (self + cross) with per-vector scales: ~2x less cache
    # HBM traffic per decode step at a small accuracy cost.
    kv_cache_quant: bool = False
    # int8 CROSS cache only (self stays bf16/fp32): the cross K/V is the
    # dominant per-step decode read (~74 MB of ~115 MB at tiny b8 — every
    # step touches all 1500 audio positions). In bf16 mode the loop reads
    # it via the scale-commuted formulation (WHISPER_TPU_Q8_CROSS=commute):
    # K's per-vector scale moves to the score axis and V's into the
    # probabilities, so the int8→bf16 converts fuse into the MXU dot
    # operand reads and no dequantized tensor ever exists. Measured e2e
    # WIN at every family size (tiny b32 +18%, large-v2 b8 +18% stacked
    # with weight_quant — DESIGN.md §29; the two earlier formulations that
    # materialized a dequantized K/V both lost, §16).
    cross_kv_quant: bool = False
    # int8 SELF cache only (cross per cross_kv_quant): the §29 commute
    # applied to the decode loop's other cache read. The self cache is
    # read in FULL every step (§24 right-sizes it, but masked slots are
    # still streamed) — ~10-12% of step bytes at the bench's 128-slot
    # cap and ~25% at the engine's 448-slot caches. bf16 (serving) mode
    # only; fp32 ignores it (token-parity keeps full-precision caches).
    # Per-vector scales ride the standard cache dict as {"k_s","v_s"};
    # decoder_step_ip reads them scale-commuted (no dequantized tensor),
    # the Pallas append kernel writes int8 rows in place, and scale rows
    # land via XLA DUS (the scale arrays are ~100x smaller than the §20
    # cache-copy pathology). Env: WHISPER_TPU_SQ=0|1 via bench.
    self_kv_quant: bool = False
    # Weight-only int8 for the decoder's per-step-read weights (attn/MLP
    # projections + tok_emb) with per-output-column scales, dequantized
    # in-graph so XLA streams the int8 bytes from HBM (the `deq` form,
    # benchmarks/wq_ab.py / DESIGN.md §28). Serving (bf16) mode only —
    # a LATENCY feature at medium/large where per-step weight reads are
    # 0.8-1.6 GB bf16. Engaged by WhisperPipeline at load; bench knob
    # WHISPER_BENCH_WQ=1.
    weight_quant: bool = False
    # int8 MXU encoder matmuls (serving/bf16 mode): dynamic per-token
    # activation quant x per-output-column weight quant, s8xs8 MXU dots
    # with int32 accumulate for the encoder's QKV/o/fc1/fc2 projections
    # (DESIGN.md §32). The encoder at d_model >= 1024 is compute-bound
    # (~36-40% MXU utilization) and v5e int8 MXU peak is ~2x bf16 — the
    # opposite regime from the decode loop where weight-dequant streaming
    # won (§28). Env override: WHISPER_TPU_ENC_I8=0|1.
    # Measured e2e NEGATIVE at every width (§32 — the XLA-level path must
    # bypass the fused tail kernel); kept as the numerics oracle for the
    # in-kernel variant below.
    encoder_quant: bool = False
    # §32b: int8 fc1/fc2 INSIDE the fused encoder block-tail kernel —
    # s8xs8 MXU dots with in-register dynamic per-row activation quant;
    # keeps the tail's VMEM residency and halves the MLP weight reads
    # (also unlocks a larger q-block at d=1280). bf16 + fused-tail mode
    # only; no-op when the tail is off. Env: WHISPER_TPU_ENC_I8K=0|1.
    encoder_mlp_quant: bool = False
    # §32b QKV addendum: XLA-level int8 for the fused-QKV projection in
    # FRONT of the fused tail kernel (dynamic per-token activation quant
    # x per-column weight quant, s8xs8 MXU dot). §32's all-XLA int8
    # encoder lost e2e because it cost the tail kernel; this hybrid keeps
    # the tail and quantizes the one big projection the kernel can't see
    # (~25% of encoder FLOPs). Measured encoder-phase −3.3..−3.9% at
    # d_model >= 1024 → e2e medium b16 +0.9%, large-v2 b16 +1.0%,
    # turbo b32 +2.5% (DESIGN.md §32b QKV addendum). Rides
    # encoder_mlp_quant (no-op when the fused tail is off).
    # Env: WHISPER_TPU_ENC_I8Q=0|1.
    encoder_qkv_quant: bool = False
    # Fused decoder-step megakernel (ops/decoder_step.py): one Pallas
    # program per greedy decode step instead of ~60 XLA fusions. None =
    # auto (currently OFF: token-identical on v5e but slower than the XLA
    # step — DESIGN.md §8); True forces it (interpret mode off-TPU, for
    # tests); False forces the XLA step. Env: WHISPER_TPU_FUSED=0|1.
    fused_step: Optional[bool] = None
    # Special-token layout. eot/sot/etc. cannot be derived from vocab_size
    # alone: large-v3 adds a 100th language token, shifting every task token
    # by +1 while keeping eot at 50257.
    eot_token: int = 50_257          # <|endoftext|>; 50256 for .en models
    n_languages: int = 99            # 100 for large-v3 family

    # ---- derived static shapes ----
    @property
    def head_dim(self) -> int:
        return self.d_model // self.n_heads

    @property
    def d_ff(self) -> int:
        return 4 * self.d_model

    @property
    def n_frames(self) -> int:
        """Mel frames per 30 s window (reference: 3000)."""
        return self.chunk_length_s * self.sample_rate // self.hop_length

    @property
    def n_samples(self) -> int:
        """Audio samples per window (480_000 at 16 kHz / 30 s)."""
        return self.chunk_length_s * self.sample_rate

    @property
    def n_freqs(self) -> int:
        return self.n_fft // 2 + 1

    # ---- special token ids (ids match vocab.txt line-1, verified in
    # SURVEY.md §2.3 against reference whisper.mojo:188-191) ----
    @property
    def sot_token(self) -> int:
        return self.eot_token + 1      # 50258 <|startoftranscript|>

    @property
    def first_language_token(self) -> int:
        return self.sot_token + 1      # 50259 == <|en|>

    @property
    def translate_token(self) -> int:
        return self.first_language_token + self.n_languages  # 50358

    @property
    def transcribe_token(self) -> int:
        return self.translate_token + 1                      # 50359

    @property
    def sot_prev_token(self) -> int:
        """<|startofprev|> — prefixes previous-window conditioning text.
        50361 in the v2 vocab (assets/vocab.txt line 50362), 50362 for
        large-v3 (the +1 language shift)."""
        return self.transcribe_token + 2                     # 50361

    @property
    def no_speech_token(self) -> int:
        """<|nospeech|>/<|nocaptions|> — its prefill probability at the SOT
        position is the openai/whisper silence signal."""
        return self.transcribe_token + 3                     # 50362

    @property
    def no_timestamps_token(self) -> int:
        return self.transcribe_token + 4                     # 50363

    @property
    def timestamp_begin(self) -> int:
        return self.no_timestamps_token + 1  # 50364 == <|0.00|>

    @property
    def max_new_tokens(self) -> int:
        """Reference caps the greedy loop at 195 steps after a 4-token
        prompt + 1 prefill-argmax token (reference whisper.mojo:205)."""
        return 195

    def replace(self, **kw) -> "WhisperConfig":
        return dataclasses.replace(self, **kw)


def _cfg(name: str, d_model: int, n_heads: int, enc_layers: int,
         dec_layers: Optional[int] = None, vocab: int = 51_865,
         n_mels: int = 80, multilingual: bool = True,
         eot: int = 50_257, n_languages: int = 99) -> WhisperConfig:
    return WhisperConfig(
        name=name, d_model=d_model, n_heads=n_heads,
        n_audio_layers=enc_layers,
        n_text_layers=dec_layers if dec_layers is not None else enc_layers,
        vocab_size=vocab, n_mels=n_mels, multilingual=multilingual,
        eot_token=eot, n_languages=n_languages,
    )


# Official OpenAI Whisper family dimensions.
CONFIGS: dict[str, WhisperConfig] = {
    "tiny":            _cfg("tiny", 384, 6, 4),
    "tiny.en":         _cfg("tiny.en", 384, 6, 4, vocab=51_864,
                            multilingual=False, eot=50_256),
    "base":            _cfg("base", 512, 8, 6),
    "base.en":         _cfg("base.en", 512, 8, 6, vocab=51_864,
                            multilingual=False, eot=50_256),
    "small":           _cfg("small", 768, 12, 12),
    "small.en":        _cfg("small.en", 768, 12, 12, vocab=51_864,
                            multilingual=False, eot=50_256),
    "medium":          _cfg("medium", 1024, 16, 24),
    "medium.en":       _cfg("medium.en", 1024, 16, 24, vocab=51_864,
                            multilingual=False, eot=50_256),
    "large-v2":        _cfg("large-v2", 1280, 20, 32),
    "large-v3":        _cfg("large-v3", 1280, 20, 32, vocab=51_866,
                            n_mels=128, n_languages=100),
    "large-v3-turbo":  _cfg("large-v3-turbo", 1280, 20, 32, dec_layers=4,
                            vocab=51_866, n_mels=128, n_languages=100),
}


# Aliases openai/whisper accepts (whisper.load_model): "turbo" is the
# official short name for large-v3-turbo; "large" tracks the newest large.
ALIASES: dict[str, str] = {
    "turbo": "large-v3-turbo",
    "large": "large-v3",
}


def get_config(name: str) -> WhisperConfig:
    try:
        return CONFIGS[ALIASES.get(name, name)]
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; have {sorted(CONFIGS)} "
            f"(+ aliases {sorted(ALIASES)})") from None


def apply_serving_quant(cfg: WhisperConfig,
                        batch: Optional[int] = None) -> WhisperConfig:
    """The measured-best single-chip serving defaults (DESIGN.md §29).

    bf16 (serving) mode enables weight-only int8 decoder weights and
    scale-commuted int8 cross-KV — a stacked e2e win at every family size
    on v5e (tiny b32 +21%, medium b16 +14%, large-v2 b8 +18%) with ≤0.4%
    per-element weight rounding and per-vector-scaled KV rounding. fp32
    (token-parity) mode is returned unchanged, as is any cfg where the
    caller already set a quant flag explicitly (their choice stands).
    Kill switch: WHISPER_TPU_AUTO_QUANT=0. Note sharded (multi-chip)
    paths reject weight_quant params — use explicit flags there.

    `batch`, when known, gates the small-batch regime: at tiny width the
    quant overheads (per-step scale/convert work) stop amortizing below
    the measured break-even — tiny b8 −3%, b1 a wash-to-negative
    (DESIGN.md §29b batch sweep) — so batch ≤ 8 at d_model 384 keeps
    quant OFF. Widths ≥ 768 win at b8 and up (large-v2 b8 +18%, §29) so
    they always quantize; the gate covers exactly the measured negative
    set. batch=None preserves the batched-serving assumption (quant on
    by width).

    `batch` means EFFECTIVE decode rows, not audio clips: beam search
    multiplies rows by the beam width, and rows are what amortize the
    per-step quant overhead — tiny beam-5 b8 (40 rows) measured 1,705
    RTFx under wq+cq vs 1,580 unquantized (DESIGN.md §31/§37), so a
    beam caller passes batch*beam_size.
    """
    import os
    if os.environ.get("WHISPER_TPU_AUTO_QUANT", "1") != "1":
        return cfg
    # normalize: a cfg built with a dtype OBJECT (jnp.float32) must hit
    # the same fp32 passthrough as the string form, not fail later in
    # quantize_weights_wq's fp32 rejection
    import jax.numpy as jnp
    if jnp.dtype(cfg.compute_dtype) == jnp.float32:
        return cfg
    if (cfg.weight_quant or cfg.cross_kv_quant or cfg.kv_cache_quant
            or cfg.self_kv_quant
            or cfg.encoder_mlp_quant or cfg.encoder_qkv_quant):
        # an explicit quant choice suppresses the auto default (their
        # choice stands — incl. the encoder flags, which the width policy
        # would otherwise stomp, e.g. a forced encoder_mlp_quant at tiny)
        return cfg
    # small-batch gate (measured negative set only): tiny-width quant at
    # b≤8 costs 0-3% — the per-step scale/convert work stops amortizing
    # (DESIGN.md §29b batch sweep)
    if batch is not None and batch <= 8 and cfg.d_model <= 384:
        return cfg
    # d_model=768 (small/small.en) is the one measured width where int8
    # cross-KV is a small e2e NEGATIVE (−3.7% at the same chain length,
    # DESIGN.md §29b) — weight-only int8 still wins there, so it keeps wq
    # alone. Every other width takes both.
    # §32b: int8 MLP inside the fused encoder tail wins the encoder phase
    # monotonically in width — tiny wash (−0.4%), base +1.8% (noise
    # floor), small +4.5%, medium +11.2%, large-v2 +12.9%, turbo +12.4% —
    # so it defaults on exactly where the win clears session variance.
    # §32b QKV addendum: the XLA int8 QKV hybrid in front of the tail
    # wins e2e at d>=1024 (medium +0.9%, large-v2 +1.0%, turbo +2.5%).
    # §35: the scale-commuted int8 SELF cache pays where the decode loop
    # is a dominant, bandwidth-bound e2e share — deep decoders at
    # d>=1024 (medium +2.3%, large-v2 +5.1%); turbo's 4-layer decoder
    # DECLINES (-1.5%, encoder-dominated) and tiny is -8.9%.
    return cfg.replace(weight_quant=True, cross_kv_quant=cfg.d_model != 768,
                       encoder_mlp_quant=cfg.d_model >= 768,
                       encoder_qkv_quant=cfg.d_model >= 1024,
                       self_kv_quant=(cfg.d_model >= 1024
                                      and cfg.n_text_layers > 4))
