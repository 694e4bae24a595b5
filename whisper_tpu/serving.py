"""Batched serving: a dynamic request batcher over the jitted pipeline.

The reference is a one-shot CLI (main.mojo) with no serving story. This
module provides the production-serving layer the north-star targets imply
(batched RTFx per chip): concurrent transcription requests are queued,
grouped into *fixed-size* batches (padding with silence rows so every step
reuses one compiled executable — static shapes are the jit contract), run
through mel + encoder + greedy decode in a single device program, and
scattered back to per-request futures.

Design notes (TPU-first):
  * Batch shape is static (max_batch); partial batches are padded, never
    re-traced. The language/task prompt is *data* (a (B, P) token array), so
    one batch can mix languages.
  * One worker thread owns the device; the chip serializes anyway, and this
    keeps the futures/locking trivial.
  * max_wait_ms bounds added latency: the batcher launches early when the
    queue goes quiet.
"""

from __future__ import annotations

import dataclasses
import queue
import threading
import time
from concurrent.futures import Future
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from whisper_tpu.audio import log_mel_spectrogram, pad_or_trim
from whisper_tpu.config import WhisperConfig, get_config
from whisper_tpu.decode import transcribe_tokens
from whisper_tpu.decode_rules import DecodeOptions
from whisper_tpu.tokenizer import Tokenizer, build_prompt


@dataclasses.dataclass
class ServeResult:
    text: str
    tokens: list[int]
    queued_s: float         # time spent waiting for a batch slot
    batch_size: int         # how many real requests shared the batch


@dataclasses.dataclass
class _Request:
    audio: np.ndarray
    language: str
    task: str
    future: Future
    t_submit: float


class BatchedTranscriber:
    """Dynamic batcher over one device.

    Usage:
        bt = BatchedTranscriber(params, "tiny", max_batch=8)
        fut = bt.submit(audio)           # returns concurrent.futures.Future
        print(fut.result().text)
        bt.close()
    """

    def __init__(self, params, cfg: WhisperConfig | str,
                 tokenizer: Optional[Tokenizer] = None,
                 max_batch: int = 8, max_wait_ms: float = 10.0,
                 max_new: Optional[int] = None,
                 opts: Optional[DecodeOptions] = None):
        self.cfg = get_config(cfg) if isinstance(cfg, str) else cfg
        self.params = params
        self.tokenizer = tokenizer or Tokenizer(config=self.cfg)
        self.max_batch = int(max_batch)
        self.max_wait_s = max_wait_ms / 1e3
        self.max_new = max_new
        self.opts = opts
        self._q: "queue.Queue[Optional[_Request]]" = queue.Queue()
        self._closed = False
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ---- client API ----
    def submit(self, audio: np.ndarray, language: str = "en",
               task: str = "transcribe") -> Future:
        """Queue one request. Audio longer than a 30 s window is split
        into per-window requests (each batches with whatever else
        arrives) and the returned future joins them in order — NOT
        silently truncated. Windows are independent (openai's
        condition_on_previous_text=False mode); the continuous engine's
        long-form driver is the conditioned path."""
        if self._closed:
            raise RuntimeError("transcriber is closed")
        audio = np.asarray(audio, np.float32).reshape(-1)
        n = self.cfg.n_samples
        if len(audio) <= n:
            return self._submit_window(audio, language, task)
        futs = [self._submit_window(audio[s:s + n], language, task)
                for s in range(0, len(audio), n)]
        out: Future = Future()

        def join():
            try:
                rs = [f.result() for f in futs]
                out.set_result(ServeResult(
                    text="".join(r.text for r in rs),
                    tokens=[t for r in rs for t in r.tokens],
                    queued_s=max(r.queued_s for r in rs),
                    batch_size=rs[0].batch_size))
            except Exception as e:
                if not out.done():
                    out.set_exception(e)

        threading.Thread(target=join, daemon=True).start()
        return out

    def _submit_window(self, audio: np.ndarray, language: str,
                       task: str) -> Future:
        fut: Future = Future()
        self._q.put(_Request(audio, language, task,
                             fut, time.perf_counter()))
        return fut

    def transcribe(self, audio: np.ndarray, language: str = "en",
                   task: str = "transcribe") -> ServeResult:
        return self.submit(audio, language, task).result()

    def close(self) -> None:
        if not self._closed:
            self._closed = True
            self._q.put(None)
            self._worker.join(timeout=60)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # ---- worker ----
    def _collect(self) -> list[_Request]:
        """Block for one request, then drain up to max_batch with a
        max_wait_ms grace window."""
        first = self._q.get()
        if first is None:
            return []
        batch = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                r = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if r is None:
                self._q.put(None)     # re-post sentinel for the outer loop
                break
            batch.append(r)
        return batch

    def _run(self) -> None:
        cfg = self.cfg
        while True:
            batch = self._collect()
            if not batch:
                return
            t0 = time.perf_counter()
            B = self.max_batch
            prompt_rows = []
            for r in batch:
                prompt_rows.append(build_prompt(cfg, r.language, r.task,
                                                timestamps=bool(
                                                    self.opts and self.opts.timestamps)))
            # Mixed prompt lengths can't share a static batch. Rather than
            # silently decoding a request under another request's prompt
            # semantics, fail the odd ones out loudly; the caller can resubmit
            # (they will land in their own batch).
            P = len(prompt_rows[0])
            kept, kept_rows = [], []
            for r, row in zip(batch, prompt_rows):
                if len(row) != P:
                    r.future.set_exception(ValueError(
                        f"prompt length {len(row)} (language={r.language!r}, "
                        f"task={r.task!r}) differs from the batch's {P}; "
                        "resubmit — it will run in its own batch"))
                else:
                    kept.append(r)
                    kept_rows.append(row)
            batch, prompt_rows = kept, kept_rows
            if not batch:
                continue
            n = len(batch)
            audio = np.zeros((B, cfg.n_samples), np.float32)
            # pad rows (incl. dummy rows) with the first real prompt
            prompts = np.tile(np.asarray(prompt_rows[0], np.int32), (B, 1))
            for i, row in enumerate(prompt_rows):
                prompts[i] = row
            for i, r in enumerate(batch):
                audio[i] = pad_or_trim(r.audio, cfg.n_samples)
            try:
                res = self._transcribe_batch(jnp.asarray(audio),
                                             jnp.asarray(prompts))
                tokens = np.asarray(res.tokens)
                lengths = np.asarray(res.lengths)
                for i, r in enumerate(batch):
                    ids = tokens[i, :int(lengths[i])].tolist()
                    r.future.set_result(ServeResult(
                        text=self.tokenizer.decode(ids), tokens=ids,
                        queued_s=t0 - r.t_submit, batch_size=n))
            except Exception as e:      # propagate to every waiter
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)

    def _transcribe_batch(self, audio: jax.Array, prompts: jax.Array):
        cfg = self.cfg
        mel = log_mel_spectrogram(audio, cfg)
        return transcribe_tokens(self.params, cfg, mel, prompts,
                                 max_new=self.max_new, opts=self.opts)
