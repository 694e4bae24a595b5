"""Concurrent SSE load against the HTTP server — DESIGN.md §34 evidence.

Starts an in-process TranscriptionServer on the continuous engine (random
weights) and drives N concurrent HTTP clients with a mixed workload:
short clips (one window) and long-form files (window-chained through
LongFormDriver, interleaving with the short requests at slot granularity).
Measures what a production client sees:

  * time-to-first-token (TTFT): POST -> first SSE token event
  * inter-token gap: median spacing of SSE token events per stream
  * completion wall + aggregate audio RTFx across all clients

Usage:
  python benchmarks/server_load.py [--model tiny] [--clients 8]
      [--slots 8] [--long-every 4] [--max-new 32] [--sync-every 8]

(--long-every N: every Nth client sends a 75 s file instead of 5 s.)
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def _wav_bytes(seconds: float, freq: float, sr: int = 16_000) -> bytes:
    t = np.arange(int(seconds * sr)) / sr
    x = (0.35 * np.sin(2 * np.pi * freq * t) * 32000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def _sse_client(port: int, body: bytes, out: dict) -> None:
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/v1/audio/transcriptions?stream=1",
        data=body, headers={"Content-Type": "audio/wav"}, method="POST")
    t0 = time.perf_counter()
    stamps = []
    done = None
    with urllib.request.urlopen(req, timeout=900) as r:
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            ev = json.loads(line[6:])
            if "token" in ev:
                stamps.append(time.perf_counter())
            elif ev.get("done"):
                done = time.perf_counter()
            elif "error" in ev:
                out["error"] = ev["error"]
                return
    out["ttft_s"] = (stamps[0] - t0) if stamps else None
    out["gap_p50_ms"] = (float(np.median(np.diff(stamps))) * 1e3
                         if len(stamps) > 1 else None)
    out["wall_s"] = (done or time.perf_counter()) - t0
    out["tokens"] = len(stamps)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--long-every", type=int, default=4)
    ap.add_argument("--long-seconds", type=float, default=75.0)
    ap.add_argument("--short-seconds", type=float, default=5.0)
    ap.add_argument("--max-new", type=int, default=32)
    ap.add_argument("--sync-every", type=int, default=8)
    ap.add_argument("--max-queue", type=int, default=64)
    args = ap.parse_args()

    from whisper_tpu.config import apply_serving_quant, get_config
    from whisper_tpu.models.whisper import init_params, quantize_weights_wq
    from whisper_tpu.server import ContinuousEngine, TranscriptionServer
    from whisper_tpu.serving_continuous import ContinuousBatcher
    from whisper_tpu.weights import to_device

    cfg = apply_serving_quant(
        get_config(args.model).replace(compute_dtype="bfloat16"))
    import jax.numpy as jnp
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                       jnp.bfloat16)
    if cfg.weight_quant:
        params = quantize_weights_wq(params, cfg)
    eng = ContinuousEngine(ContinuousBatcher(
        params, cfg, max_slots=args.slots, max_new=args.max_new,
        sync_every=args.sync_every, max_queue=args.max_queue))
    with TranscriptionServer(eng, cfg, host="127.0.0.1", port=0) as srv:
        # warmup: the engine-level bucket warmup (what the server daemon
        # runs at startup) + one SSE round trip for the HTTP path
        eng.warmup()
        _sse_client(srv.port, _wav_bytes(args.short_seconds, 330.0), {})

        bodies, kinds = [], []
        total_audio_s = 0.0
        for i in range(args.clients):
            long = args.long_every > 0 and (i + 1) % args.long_every == 0
            sec = args.long_seconds if long else args.short_seconds
            bodies.append(_wav_bytes(sec, 220.0 + 20 * i))
            kinds.append("long" if long else "short")
            total_audio_s += sec

        results = [dict(kind=k) for k in kinds]
        threads = [threading.Thread(target=_sse_client,
                                    args=(srv.port, bodies[i], results[i]))
                   for i in range(args.clients)]
        t0 = time.perf_counter()
        for th in threads:
            th.start()
        for th in threads:
            th.join()
        wall = time.perf_counter() - t0

        q = eng._b.queue_stats()
        errs = [r for r in results if "error" in r]
        ok = [r for r in results if "error" not in r and r.get("ttft_s")]
        ttfts = sorted(r["ttft_s"] for r in ok)
        gaps = [r["gap_p50_ms"] for r in ok if r.get("gap_p50_ms")]
        print(json.dumps({
            "metric": f"server_sse_{args.model}_c{args.clients}"
                      f"_s{args.slots}",
            "value": round(total_audio_s / wall, 2),
            "unit": "audio_s_per_wall_s",
            "clients": args.clients,
            "mix": {"short": kinds.count("short"),
                    "long": kinds.count("long")},
            "wall_s": round(wall, 3),
            "ttft_p50_s": round(ttfts[len(ttfts) // 2], 3) if ttfts else None,
            "ttft_max_s": round(ttfts[-1], 3) if ttfts else None,
            "gap_p50_ms": (round(float(np.median(gaps)), 2)
                           if gaps else None),
            "errors": len(errs),
            "engine_queue": q,
            "sync_every": args.sync_every,
            "device": str(jax.devices()[0]),
        }))


if __name__ == "__main__":
    main()
