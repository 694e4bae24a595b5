"""HTTP serving daemon: a REST front over the dynamic batcher.

The reference has no serving story at all (one-shot CLI, main.mojo:1-43);
production deployment needs a long-lived process that amortizes compilation
across requests and batches concurrent callers onto the chip. This is that
process, stdlib-only (http.server) so it runs anywhere the framework does:

    python -m whisper_tpu.server --flat-bin weights.bin --port 9000
    curl -s -X POST --data-binary @clip.wav -H 'Content-Type: audio/wav' \
        'http://localhost:9000/v1/audio/transcriptions?language=en'

Endpoints
    POST /v1/audio/transcriptions   body = WAV bytes (any sample rate /
        channels — decoded+resampled by the native loader), or JSON
        {"audio_b64": ..., "language": ..., "task": ...}. Query params
        language/task override. Returns {"text", "tokens", "queued_s",
        "batch_size"}.
    GET  /healthz                   {"status": "ok", "model": ...}
    GET  /v1/stats                  request counters + batcher config.

Concurrency model: HTTP threads (ThreadingHTTPServer) block on
BatchedTranscriber futures; the batcher's single worker thread groups
whatever arrives within max_wait_ms into one padded-batch TPU dispatch
(serving.py). Errors propagate per-request as HTTP 4xx/5xx, never killing
the engine.
"""

from __future__ import annotations

import argparse
import base64
import json
import os
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional
from urllib.parse import parse_qs, urlparse

import jax
import numpy as np

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu",
# silently overriding a user's JAX_PLATFORMS=cpu. Honor the documented env
# var semantics: an explicit JAX_PLATFORMS wins (same re-pin as cli.py).
_env_platforms = os.environ.get("JAX_PLATFORMS", "").strip()
if _env_platforms:
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass


class _Stats:
    def __init__(self):
        self.lock = threading.Lock()
        self.received = 0
        self.completed = 0
        self.failed = 0

    def snapshot(self) -> dict:
        with self.lock:
            return {"received": self.received, "completed": self.completed,
                    "failed": self.failed,
                    "in_flight": self.received - self.completed - self.failed}


def _decode_wav_bytes(data: bytes, sample_rate: int) -> np.ndarray:
    """WAV bytes -> mono float32 @ sample_rate via the native loader
    (falls back to the pure-Python WAV path inside load_audio)."""
    from whisper_tpu.native import load_audio

    with tempfile.NamedTemporaryFile(suffix=".wav") as f:
        f.write(data)
        f.flush()
        return load_audio(f.name, sample_rate)


def make_handler(transcriber, cfg, stats: _Stats):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def log_message(self, *a):        # quiet by default
            pass

        def _json(self, code: int, obj: dict) -> None:
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                self._json(200, {"status": "ok", "model": cfg.name})
            elif path == "/v1/stats":
                extra = {}
                b = getattr(transcriber, "_b", None)
                if b is not None and hasattr(b, "queue_stats"):
                    extra["queue"] = b.queue_stats()   # continuous engine
                self._json(200, {**stats.snapshot(),
                                 "max_batch": transcriber.max_batch,
                                 "max_wait_ms": transcriber.max_wait_s * 1e3,
                                 **extra})
            else:
                self._json(404, {"error": f"no such path: {path}"})

        def do_POST(self):
            url = urlparse(self.path)
            if url.path != "/v1/audio/transcriptions":
                self._json(404, {"error": f"no such path: {url.path}"})
                return
            with stats.lock:
                stats.received += 1
            try:
                n = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(n)
                q = {k: v[0] for k, v in parse_qs(url.query).items()}
                ctype = self.headers.get("Content-Type", "")
                language, task = q.get("language", "en"), \
                    q.get("task", "transcribe")
                if ctype.startswith("application/json"):
                    req = json.loads(raw)
                    audio = _decode_wav_bytes(
                        base64.b64decode(req["audio_b64"]), cfg.sample_rate)
                    language = req.get("language", language)
                    task = req.get("task", task)
                else:
                    audio = _decode_wav_bytes(raw, cfg.sample_rate)
            except Exception as e:          # malformed request
                with stats.lock:
                    stats.failed += 1
                self._json(400, {"error": f"bad request: {e}"})
                return
            stream = (q.get("stream", "") in ("1", "true")
                      or "text/event-stream" in
                      (self.headers.get("Accept") or ""))
            if stream:
                if not hasattr(transcriber, "transcribe_stream"):
                    with stats.lock:
                        stats.failed += 1
                    self._json(501, {"error": "streaming requires the "
                                     "continuous engine (--engine "
                                     "continuous)"})
                    return
                self._sse(audio, language, task)
                return
            try:
                res = transcriber.transcribe(audio, language, task)
                with stats.lock:
                    stats.completed += 1
                self._json(200, {"text": res.text, "tokens": res.tokens,
                                 "queued_s": res.queued_s,
                                 "batch_size": res.batch_size})
            except Exception as e:          # engine-side failure
                with stats.lock:
                    stats.failed += 1
                from whisper_tpu.serving_continuous import QueueFull
                if isinstance(e, QueueFull):   # admission bound: backpressure
                    self.send_response(503)
                    self.send_header("Retry-After", "1")
                    body = json.dumps({"error": str(e)}).encode()
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self._json(500, {"error": str(e)})

        def _sse(self, audio, language, task):
            """Server-sent-events response: one `data:` event per generated
            token as the continuous engine commits it, then a final event
            with the full result. Connection: close delimits the stream
            (no Content-Length on purpose)."""
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Connection", "close")
            self.end_headers()

            def emit(obj: dict):
                self.wfile.write(
                    b"data: " + json.dumps(obj).encode() + b"\n\n")
                self.wfile.flush()

            try:
                for ev in transcriber.transcribe_stream(audio, language,
                                                        task):
                    emit(ev)
                with stats.lock:
                    stats.completed += 1
            except Exception as e:
                with stats.lock:
                    stats.failed += 1
                try:
                    emit({"error": str(e)})
                except Exception:
                    pass
            self.close_connection = True

    return Handler


class ContinuousEngine:
    """Adapter exposing the BatchedTranscriber interface on top of the
    slot-based ContinuousBatcher: a pump thread drives step() whenever work
    exists, HTTP threads submit() and block on a per-request future.
    Requests join/leave the shared decode batch at TOKEN granularity, so a
    long transcript never holds a batch hostage (serving_continuous.py)."""

    REQUEST_TIMEOUT_S = 600.0

    def __init__(self, batcher):
        import queue as _q

        from whisper_tpu.serving_longform import LongFormDriver
        self._b = batcher
        self.max_batch = batcher.B
        self.max_wait_s = 0.0
        self._lock = threading.Lock()
        self._wake = _q.Queue()
        self._pending: list = []          # futures not yet resolved
        self._closed = False
        # audio > one 30 s window is chained through the long-form driver
        # (window k+1 submitted at window k's harvest, prev-text
        # conditioning) instead of being silently truncated; windows of
        # long files interleave with short requests in the slot batch
        self._lf = LongFormDriver(batcher, condition_on_previous=True,
                                  retain_results=False)
        self._pump = threading.Thread(target=self._run, daemon=True)
        self._pump.start()

    def transcribe(self, audio: np.ndarray, language: str = "en",
                   task: str = "transcribe"):
        import concurrent.futures
        import time as _t
        if self._closed:
            raise RuntimeError("engine is closed")
        # validate BEFORE enqueueing: a bad request must fail on THIS
        # thread (HTTP 400), never inside the shared pump thread
        from whisper_tpu.tokenizer import build_prompt
        build_prompt(self._b.cfg, language if language != "auto" else "en",
                     task)
        fut: "concurrent.futures.Future" = concurrent.futures.Future()
        t0 = _t.perf_counter()

        def done(rid, ids):
            if fut.done():                 # already failed by the pump
                return
            occupancy = sum(s is not None for s in self._b._slots)
            fut.set_result(_Result(
                text=self._b.tokenizer.decode(ids), tokens=ids,
                queued_s=_t.perf_counter() - t0, batch_size=occupancy))

        def done_lf(fid, res):
            if fut.done():
                return
            occupancy = sum(s is not None for s in self._b._slots)
            fut.set_result(_Result(
                text=res.text, tokens=res.tokens,
                queued_s=_t.perf_counter() - t0, batch_size=occupancy))

        lf_fid = None
        with self._lock:
            if len(audio) > self._b.cfg.n_samples:
                lf_fid = self._lf.submit(audio, language, task,
                                         callback=done_lf)
            else:
                self._b.submit(audio, language, task, callback=done)
            self._pending.append(fut)
        self._wake.put(None)
        try:
            return fut.result(timeout=self.REQUEST_TIMEOUT_S)
        finally:
            with self._lock:
                if fut in self._pending:
                    self._pending.remove(fut)
                if lf_fid is not None and not fut.done():
                    # timed out: stop chaining the abandoned file's
                    # windows (they would occupy a slot forever)
                    self._lf.cancel(lf_fid)

    def transcribe_stream(self, audio: np.ndarray, language: str = "en",
                          task: str = "transcribe"):
        """Generator of SSE-ready event dicts: {"token", "text_delta"} per
        committed token, then {"done": True, "text", "tokens"}. Tokens are
        streamed as the slot engine commits them — the HTTP thread consumes
        a queue fed by the pump thread's on_token callback."""
        import queue as _q
        import concurrent.futures
        if self._closed:
            raise RuntimeError("engine is closed")
        from whisper_tpu.tokenizer import build_prompt
        build_prompt(self._b.cfg, language if language != "auto" else "en",
                     task)
        events: "_q.Queue" = _q.Queue()
        fut: "concurrent.futures.Future" = concurrent.futures.Future()

        def on_token(rid, tid):
            events.put(("token", tid))

        def done(rid, ids):
            if not fut.done():
                fut.set_result(ids)

        def done_lf(fid, res):
            if not fut.done():
                fut.set_result(res.tokens)

        lf_fid = None
        with self._lock:
            if len(audio) > self._b.cfg.n_samples:
                lf_fid = self._lf.submit(audio, language, task,
                                         callback=done_lf,
                                         on_token=on_token)
            else:
                self._b.submit(audio, language, task, callback=done,
                               on_token=on_token)
            self._pending.append(fut)      # pump faults fail this future
        self._wake.put(None)
        tok = self._b.tokenizer
        emitted: list = []
        text_so_far = ""
        deadline = time.monotonic() + self.REQUEST_TIMEOUT_S
        try:
            while True:
                try:
                    kind, tid = events.get(timeout=0.1)
                except _q.Empty:
                    if fut.done():
                        break
                    if time.monotonic() > deadline:
                        raise TimeoutError("request timed out")
                    continue
                emitted.append(tid)
                text = tok.decode(emitted)
                delta, text_so_far = text[len(text_so_far):], text
                yield {"token": int(tid), "text_delta": delta}
            ids = fut.result(timeout=0)    # re-raises pump faults
            yield {"done": True, "text": tok.decode(ids), "tokens": ids}
        finally:
            with self._lock:
                if fut in self._pending:
                    self._pending.remove(fut)
                if lf_fid is not None and not fut.done():
                    # client disconnected or timed out mid-stream: stop
                    # chaining the abandoned file's windows
                    self._lf.cancel(lf_fid)

    def _reset_slots(self):
        """Recover service after a step() fault: a poisoned in-flight slot
        would otherwise stay busy=True forever (step() re-raising on every
        pump iteration turns one bad request into a permanent outage while
        /healthz still reports ok). Rebuilds the device state from scratch —
        _engine_step donates its state (in-place cache append), so a failed
        step may have consumed the old buffers. Called with self._lock
        held."""
        try:
            self._b.reset_state()
        except Exception:
            # even allocation failed; clear the slots so the pump doesn't
            # spin on busy=True, and let the next fill retry the alloc
            self._b._slots = [None] * self._b.B

    def _run(self):
        import queue as _q
        while not self._closed:
            with self._lock:
                busy = (bool(self._b._queue)
                        or any(s is not None for s in self._b._slots))
            if busy:
                try:
                    with self._lock:
                        # sync_every>1: K pipelined single-step dispatches
                        # per host readback (measured: the k-fused scan
                        # program is ~40x slower per token — see
                        # run_until_idle); streaming latency grows by <=K
                        for _ in range(getattr(self._b, "sync_every", 1)):
                            self._b.step_device()
                        self._b.sync()
                except Exception as e:     # engine fault: fail the pending
                    with self._lock:      # requests, keep the pump alive
                        for fut in self._pending:
                            if not fut.done():
                                fut.set_exception(e)
                        self._pending.clear()
                        self._b._queue.clear()
                        self._reset_slots()
                        # drop in-flight long-form chains too (their
                        # futures are already failed; a fresh driver
                        # avoids leaking dead per-file state)
                        from whisper_tpu.serving_longform import (
                            LongFormDriver,
                        )
                        self._lf = LongFormDriver(
                            self._b, condition_on_previous=True,
                            retain_results=False)
                    time.sleep(0.05)       # no hot spin on persistent faults
            else:
                try:                       # idle: sleep until a submit
                    self._wake.get(timeout=0.2)
                except _q.Empty:
                    pass

    def warmup(self, buckets: Optional[tuple] = None) -> None:
        """Compile the serving executables before opening to traffic
        (ContinuousBatcher.warmup under the pump lock — a cold-shape
        compile mid-traffic stalls every live stream; DESIGN.md §34)."""
        with self._lock:
            self._b.warmup(buckets)

    def close(self):
        self._closed = True
        self._wake.put(None)
        self._pump.join(timeout=30)


import dataclasses as _dc


@_dc.dataclass
class _Result:
    text: str
    tokens: list
    queued_s: float
    batch_size: int


class TranscriptionServer:
    """Owns the HTTP server + batcher pair; serve_forever() or use as a
    context manager (tests bind port 0 and read .port)."""

    def __init__(self, transcriber, cfg, host: str = "0.0.0.0",
                 port: int = 9000):
        self.transcriber = transcriber
        self.stats = _Stats()
        self.httpd = ThreadingHTTPServer(
            (host, port), make_handler(transcriber, cfg, self.stats))
        self.port = self.httpd.server_address[1]

    def serve_forever(self):
        self.httpd.serve_forever()

    def __enter__(self):
        self._t = threading.Thread(target=self.httpd.serve_forever,
                                   daemon=True)
        self._t.start()
        return self

    def __exit__(self, *exc):
        self.httpd.shutdown()
        self.httpd.server_close()
        self.transcriber.close()


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(prog="whisper_tpu.server")
    p.add_argument("--model", default="tiny")
    p.add_argument("--weights", help="npz checkpoint")
    p.add_argument("--flat-bin", help="reference-format weight blob")
    p.add_argument("--random-weights", action="store_true")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=9000)
    p.add_argument("--max-batch", type=int, default=8)
    p.add_argument("--max-wait-ms", type=float, default=10.0)
    p.add_argument("--max-new", type=int, default=None)
    p.add_argument("--sync-every", type=int, default=1,
                   help="continuous engine: device steps per host readback "
                        "(>1 pipelines dispatch; +K tokens stream latency)")
    p.add_argument("--max-queue", type=int, default=64,
                   help="continuous engine admission bound: submits beyond "
                        "this queue depth get HTTP 503 + Retry-After "
                        "(backpressure beats unbounded latency); 0 = "
                        "unbounded")
    p.add_argument("--engine", choices=["dynamic", "continuous"],
                   default="dynamic",
                   help="dynamic: whole-request batches (serving.py); "
                        "continuous: token-granular slot engine "
                        "(serving_continuous.py) — long transcripts never "
                        "hold a batch hostage")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default="bfloat16",
                   help="serving daemon default is bfloat16 serving mode "
                        "(with the §29 int8 serving quantization applied "
                        "automatically); float32 = token-parity mode")
    p.add_argument("--no-quant", action="store_true",
                   help="bf16 without the int8 serving defaults "
                        "(weight-only int8 + int8 cross-KV, DESIGN.md §29)")
    p.add_argument("--no-warmup", action="store_true",
                   help="continuous engine: skip the startup compile of "
                        "the serving executables (smallest + largest "
                        "prompt buckets); a cold-shape compile then stalls "
                        "all live streams the first time traffic hits it")
    args = p.parse_args(argv)

    from whisper_tpu.config import get_config
    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.serving import BatchedTranscriber

    cfg = get_config(args.model).replace(compute_dtype=args.dtype)
    quant = "off" if args.no_quant else "auto"
    if args.flat_bin:
        pipe = WhisperPipeline.from_flat_bin(args.flat_bin, cfg, quant=quant)
    elif args.weights:
        pipe = WhisperPipeline.from_npz(args.weights, cfg, quant=quant)
    elif args.random_weights:
        pipe = WhisperPipeline.from_random(cfg, quant=quant)
    else:
        p.error("need one of --weights / --flat-bin / --random-weights")

    if args.engine == "continuous":
        from whisper_tpu.serving_continuous import ContinuousBatcher
        bt = ContinuousEngine(ContinuousBatcher(
            pipe.params, pipe.cfg, max_slots=args.max_batch,
            max_new=args.max_new, tokenizer=pipe.tokenizer,
            sync_every=args.sync_every,
            max_queue=args.max_queue or None))
        if not args.no_warmup:
            print("warming serving executables ...", flush=True)
            bt.warmup()
    else:
        bt = BatchedTranscriber(pipe.params, pipe.cfg, pipe.tokenizer,
                                max_batch=args.max_batch,
                                max_wait_ms=args.max_wait_ms,
                                max_new=args.max_new)
    srv = TranscriptionServer(bt, pipe.cfg, args.host, args.port)
    print(f"serving {pipe.cfg.name} on {args.host}:{srv.port} "
          f"(backend={jax.default_backend()})", flush=True)
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        bt.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
