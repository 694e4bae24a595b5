"""End-to-end transcription pipeline.

Replaces the reference's main.mojo:11-45 flow (load weights -> load vocab ->
read mel -> transcribe -> decode tokens) with a reusable object that owns the
jitted compute graph and produces per-phase timing (the observability the
reference only has as ad-hoc perf_counter prints, main.mojo:29-33).

Long-form audio (reference: hard 30 s cap, export_weights.py:112-114) is
handled by sliding 30 s windows with fresh KV state per window and
previous-window text conditioning optional — each window is one jitted call.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.audio import energy_vad, log_mel_spectrogram, pad_or_trim
from whisper_tpu.config import WhisperConfig, get_config
from whisper_tpu.decode import (
    decode_from_encoder,
    detect_language,
    encode,
    transcribe_tokens,
)
from whisper_tpu.decode_rules import DecodeOptions, non_speech_tokens
from whisper_tpu.tokenizer import LANGUAGES, Tokenizer, build_prompt
from whisper_tpu import weights as weights_lib


# openai/whisper fallback thresholds: a decode is rejected (and retried at
# the next higher temperature) when the text is degenerate-repetitive
# (gzip compression ratio > 2.4) or the model is unconfident
# (mean chosen-token logprob < -1.0).
COMPRESSION_RATIO_THRESHOLD = 2.4
LOGPROB_THRESHOLD = -1.0
NO_SPEECH_THRESHOLD = 0.6
FALLBACK_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)


def compression_ratio(text: str) -> float:
    """Degenerate-repetition detector (openai/whisper semantics)."""
    import zlib
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


@dataclasses.dataclass
class Transcription:
    text: str
    tokens: list[int]
    timings: dict[str, float]
    words: Optional[list] = None       # [WordTiming] when word_timestamps
    segments: Optional[list] = None    # [{start,end,text}] when timestamps


class WhisperPipeline:
    def __init__(self, cfg: WhisperConfig | str, params,
                 tokenizer: Optional[Tokenizer] = None,
                 alignment_heads: Optional[Sequence[tuple]] = None,
                 quant: str = "auto",
                 batch_hint: Optional[int] = None):
        """quant: "auto" (default) applies the measured-best single-chip
        serving quantization for the cfg's dtype — bf16 gains weight-only
        int8 + scale-commuted int8 cross-KV, a stacked e2e win at every
        family size (DESIGN.md §29); fp32 token-parity mode and any cfg
        with an explicitly-set quant flag pass through unchanged. "off"
        respects the cfg exactly as given (also: WHISPER_TPU_AUTO_QUANT=0).
        batch_hint: expected EFFECTIVE decode rows (serving batch x beam
        width) when the caller knows it — below the measured break-even
        (≤8 rows at tiny width, DESIGN.md §29b/§37) the auto policy
        keeps quant off; None assumes batched serving.
        """
        self.cfg = get_config(cfg) if isinstance(cfg, str) else cfg
        if quant not in ("auto", "off"):
            raise ValueError(f"quant must be 'auto' or 'off', got {quant!r}")
        if quant == "auto":
            from whisper_tpu.config import apply_serving_quant
            self.cfg = apply_serving_quant(self.cfg, batch=batch_hint)
        # serving contract: a non-fp32 compute dtype stores the weights in
        # that dtype too (halves weight HBM; the models cast at use-sites
        # but a carried fp32 tree would poison scan carries to fp32)
        dtype = jnp.dtype(self.cfg.compute_dtype)
        if dtype != jnp.float32:
            params = weights_lib.to_device(params, dtype)
        if self.cfg.weight_quant:
            # weight-only int8 on the decoder's per-step-read weights
            # (DESIGN.md §28); quantize_weights_wq rejects fp32 configs
            from whisper_tpu.models.whisper import quantize_weights_wq
            params = quantize_weights_wq(params, self.cfg)
        self.params = params
        self.tokenizer = tokenizer or Tokenizer(config=self.cfg)
        # official (layer, head) word-alignment table when a checkpoint
        # sidecar provides one; None = upper-half-layers fallback
        self.alignment_heads = alignment_heads

    # ---- constructors (model: family name or a full WhisperConfig) ----
    @classmethod
    def from_flat_bin(cls, path: str, model="tiny",
                      vocab_path: Optional[str] = None,
                      quant: str = "auto",
                      batch_hint: Optional[int] = None) -> "WhisperPipeline":
        """Load a reference-format headerless fp32 weight blob
        (SURVEY.md §2.5 contract)."""
        from whisper_tpu.alignment import find_alignment_heads
        cfg = get_config(model) if isinstance(model, str) else model
        params = weights_lib.from_flat_bin_path(path, cfg)
        return cls(cfg, weights_lib.to_device(params),
                   Tokenizer(vocab_path, config=cfg),
                   alignment_heads=find_alignment_heads(path), quant=quant,
                   batch_hint=batch_hint)

    @classmethod
    def from_npz(cls, path: str, model="tiny",
                 quant: str = "auto",
                 batch_hint: Optional[int] = None) -> "WhisperPipeline":
        from whisper_tpu.alignment import find_alignment_heads
        cfg = get_config(model) if isinstance(model, str) else model
        params = weights_lib.load_npz(path, cfg)
        return cls(cfg, weights_lib.to_device(params),
                   alignment_heads=find_alignment_heads(path), quant=quant,
                   batch_hint=batch_hint)

    @classmethod
    def from_random(cls, model="tiny", seed: int = 0,
                    quant: str = "auto",
                    batch_hint: Optional[int] = None) -> "WhisperPipeline":
        """Random weights — for benchmarks and tests without checkpoints."""
        from whisper_tpu.models.whisper import init_params
        cfg = get_config(model) if isinstance(model, str) else model
        return cls(cfg, init_params(cfg, jax.random.PRNGKey(seed)),
                   quant=quant, batch_hint=batch_hint)

    # ---- decode options ----
    def make_options(self, timestamps: bool = False,
                     suppress_nonspeech: bool = False,
                     temperature: float = 0.0,
                     beam_size: int = 1,
                     length_penalty: Optional[float] = None) -> DecodeOptions:
        """Build the standard rule stack (openai/whisper-style; the
        reference has no rules at all — raw argmax, whisper.mojo:205-221)."""
        suppress = (non_speech_tokens(self.cfg, self.tokenizer)
                    if suppress_nonspeech else ())
        return DecodeOptions(
            suppress_tokens=suppress, suppress_blank=suppress_nonspeech,
            timestamps=timestamps, temperature=temperature,
            beam_size=beam_size, length_penalty=length_penalty)

    # ---- inference ----
    def detect_language(self, enc_out) -> str:
        """Most probable language code for an encoder output (capability
        extension; the reference hardcodes <|en|>, whisper.mojo:188-191)."""
        probs = np.asarray(detect_language(self.params, self.cfg, enc_out))
        return LANGUAGES[int(probs[0].argmax())]

    def transcribe_window(self, audio: np.ndarray, language: str = "en",
                          task: str = "transcribe",
                          max_new: Optional[int] = None,
                          opts: Optional[DecodeOptions] = None,
                          prev_tokens: tuple = (),
                          seed: int = 0,
                          fallback_temperatures: Sequence[float] = (),
                          no_speech_threshold: Optional[float] = None,
                          word_timestamps: bool = False,
                          window_offset_s: float = 0.0,
                          ) -> Transcription:
        """Transcribe one <=30 s window (the reference's whole capability,
        whisper.mojo:184-223), plus auto language detection
        (language="auto") and the openai/whisper temperature-fallback
        protocol: retry at increasing temperature until the transcript
        passes the compression-ratio and avg-logprob thresholds."""
        cfg = self.cfg
        t0 = time.perf_counter()
        wav = jnp.asarray(pad_or_trim(audio, cfg.n_samples))[None]
        mel = log_mel_spectrogram(wav, cfg)
        enc_out = encode(self.params, cfg, mel)
        enc_out.block_until_ready()
        t1 = time.perf_counter()

        if language == "auto":
            language = self.detect_language(enc_out)
        prompt = jnp.asarray(
            [build_prompt(cfg, language, task,
                          timestamps=bool(opts and opts.timestamps),
                          prev_tokens=prev_tokens)], jnp.int32)
        beam = opts.beam_size if opts is not None else 1
        base = opts or DecodeOptions()
        temps = tuple(fallback_temperatures) or (base.temperature,)

        def strip_prev(ids_full: list) -> tuple[list, int]:
            """Drop the <|startofprev|> region: DecodeResult.tokens spans
            the FULL buffer including the conditioning prefix, whose
            tokens are ordinary text — leaving them in duplicated the
            previous window's text into this window's text/segments/
            conditioning AND diluted the compression-ratio fallback gate
            (long-form echo bug, r3). Returns (ids from SOT, offset)."""
            if not prev_tokens or not ids_full:
                return ids_full, 0
            try:
                off = ids_full.index(cfg.sot_token)
            except ValueError:
                return ids_full, 0
            return ids_full[off:], off

        ids: list[int] = []
        sot_off = 0
        res = None
        for ti, temp in enumerate(temps):
            run_opts = base._replace(temperature=float(temp))
            rng = (jax.random.PRNGKey(seed + ti) if temp > 0 else None)
            # beam search only at temperature 0 (openai/whisper behavior:
            # fallback temps switch to sampling)
            res = decode_from_encoder(self.params, cfg, enc_out, prompt,
                                      max_new=max_new, opts=run_opts,
                                      beam_size=beam if temp == 0 else 1,
                                      rng=rng)
            res.tokens.block_until_ready()
            n = int(res.lengths[0])
            ids, sot_off = strip_prev(np.asarray(res.tokens)[0, :n].tolist())
            if len(temps) == 1:
                break
            # gate on THIS window's text only (prev echo would dilute the
            # repetition signal compression_ratio measures)
            text = self.tokenizer.decode(ids)
            avg_lp = (float(res.avg_logprob(prompt.shape[1])[0])
                      if res.sum_logprobs is not None else 0.0)
            if (compression_ratio(text) <= COMPRESSION_RATIO_THRESHOLD
                    and avg_lp >= LOGPROB_THRESHOLD):
                break
        t2 = time.perf_counter()
        # silence gate (openai semantics): confident no-speech AND
        # low-confidence text => drop the window's text
        if (no_speech_threshold is not None
                and res is not None and res.no_speech_prob is not None):
            nsp = float(np.asarray(res.no_speech_prob)[0])
            avg_lp = (float(res.avg_logprob(prompt.shape[1])[0])
                      if res.sum_logprobs is not None else 0.0)
            if nsp > no_speech_threshold and avg_lp < LOGPROB_THRESHOLD:
                ids = []
        text = self.tokenizer.decode(ids)
        words = segments = None
        if word_timestamps and ids:
            from whisper_tpu.alignment import word_timestamps as _align
            secs = min(len(audio) / cfg.sample_rate, cfg.chunk_length_s)
            words = _align(self.params, cfg, self.tokenizer, ids, enc_out,
                           audio_seconds=max(secs, 1.0),
                           alignment_heads=self.alignment_heads,
                           prompt_len=prompt.shape[1] - sot_off)
            for w in words:
                w.start += window_offset_s
                w.end += window_offset_s
        if opts is not None and opts.timestamps and ids:
            from whisper_tpu.tokenizer import split_segments
            segments = split_segments(cfg, ids, self.tokenizer,
                                      window_offset_s=window_offset_s)
        t3 = time.perf_counter()
        return Transcription(
            text=text, tokens=ids,
            timings={"mel_s": t1 - t0, "decode_s": t2 - t1,
                     "detok_s": t3 - t2, "total_s": t3 - t0},
            words=words, segments=segments)

    def transcribe(self, audio: np.ndarray, language: str = "en",
                   task: str = "transcribe",
                   max_new: Optional[int] = None,
                   opts: Optional[DecodeOptions] = None,
                   condition_on_previous: bool = False,
                   fallback_temperatures: Sequence[float] = (),
                   initial_prompt: Optional[str] = None,
                   word_timestamps: bool = False,
                   no_speech_threshold: Optional[float] = None,
                   vad_threshold_db: Optional[float] = None) -> Transcription:
        """Long-form: sliding 30 s windows, optionally conditioning each
        window on the previous window's text via <|startofprev|>
        (capability extension; the reference hard-caps input at one window,
        export_weights.py:112-114).

        With timestamp decoding active, windows advance by the last *closed*
        segment's end time (openai/whisper seek semantics) instead of a
        fixed 30 s — audio cut mid-sentence is retried at the next window's
        start rather than lost."""
        cfg = self.cfg
        audio = np.asarray(audio, dtype=np.float32).reshape(-1)
        texts, all_ids = [], []
        all_words: list = []
        all_segments: list = []
        # initial_prompt text conditions the first window via <|startofprev|>
        # (canonical BPE — segmentations match model training, tokenizer.py)
        prev: tuple = (tuple(self.tokenizer.encode(initial_prompt))
                       if initial_prompt else ())
        timings = {"mel_s": 0.0, "decode_s": 0.0, "detok_s": 0.0, "total_s": 0.0}
        seek = 0
        use_seek = bool(opts and opts.timestamps)
        while seek < max(len(audio), 1):
            offset_s = seek / cfg.sample_rate
            chunk = audio[seek:seek + cfg.n_samples]
            if vad_threshold_db is not None and not energy_vad(
                    chunk, cfg.sample_rate, threshold_db=vad_threshold_db):
                # silent window: skip mel/encode/decode entirely (VAD gate;
                # the model-based no_speech gate still covers borderline
                # windows that pass this cheap filter)
                seek += cfg.n_samples
                if len(chunk) < cfg.n_samples:
                    break
                continue
            r = self.transcribe_window(
                chunk, language, task, max_new=max_new,
                opts=opts, prev_tokens=prev,
                fallback_temperatures=fallback_temperatures,
                no_speech_threshold=no_speech_threshold,
                word_timestamps=word_timestamps,
                window_offset_s=offset_s)
            texts.append(r.text)
            all_ids.extend(r.tokens)
            if r.words:
                all_words.extend(r.words)
            if r.segments:
                all_segments.extend(r.segments)
            if condition_on_previous:
                # text tokens only (strip specials), capped at half the ctx
                gen = [t for t in r.tokens if t < cfg.eot_token]
                prev = tuple(gen[-(cfg.n_text_ctx // 2 - 8):])
            for k in timings:
                timings[k] += r.timings[k]
            advance_s = float(cfg.chunk_length_s)
            if use_seek and r.segments:
                last_end = r.segments[-1].get("end")
                if last_end is not None:
                    # closed final segment: resume exactly there (min 1 s
                    # forward progress guards degenerate predictions)
                    advance_s = max(last_end - offset_s, 1.0)
            seek += int(round(advance_s * cfg.sample_rate))
            if len(chunk) < cfg.n_samples:
                break                       # that was the final window
        return Transcription(text="".join(texts), tokens=all_ids,
                             timings=timings,
                             words=all_words or None,
                             segments=all_segments or None)


def load_wav(path: str, target_rate: int = 16_000) -> np.ndarray:
    """Host-side WAV loader + resampler (reference does this offline in
    Python: export_weights.py:96-111 — download, mono mix, scipy resample)."""
    import wave

    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        width = w.getsampwidth()
        channels = w.getnchannels()
        raw = w.readframes(n)
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 2147483648.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if channels > 1:
        x = x.reshape(-1, channels).mean(axis=1)
    if rate != target_rate:
        try:
            from scipy.signal import resample
            x = resample(x, int(len(x) * target_rate / rate)).astype(np.float32)
        except ImportError:
            t_old = np.arange(len(x)) / rate
            t_new = np.arange(int(len(x) * target_rate / rate)) / target_rate
            x = np.interp(t_new, t_old, x).astype(np.float32)
    return x
