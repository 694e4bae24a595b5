"""Continuous-batching engine throughput on the real chip.

Measures the serving centerpiece end-to-end: N requests arrive in waves,
join the slot engine at token granularity, and are harvested as they
finish. Reports sustained generated tokens/s and effective audio RTFx.

Knobs (env):
  CONT_SLOTS       engine slots / lockstep batch rows   (default 16)
  CONT_REQUESTS    total requests                       (default 64)
  CONT_MAX_NEW     generated tokens per request         (default 48)
  CONT_SYNC_EVERY  device steps per host readback       (default 8)
  WHISPER_BENCH_MODEL / WHISPER_BENCH_DTYPE as in bench.py

A/B of interest: CONT_SYNC_EVERY=1 (token-granular harvest, one ~30 ms
tunnel round-trip per token) vs 8/32 (pipelined dispatch). Random weights;
compute is step-count-bound like bench.py (random-logit EOT within
max_new steps is ~max_new/51865 per row — negligible).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def main() -> None:
    from whisper_tpu.config import get_config
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.serving_continuous import ContinuousBatcher

    model = os.environ.get("WHISPER_BENCH_MODEL", "tiny")
    dtype = os.environ.get("WHISPER_BENCH_DTYPE", "bfloat16")
    slots = int(os.environ.get("CONT_SLOTS", "16"))
    n_req = int(os.environ.get("CONT_REQUESTS", "64"))
    max_new = int(os.environ.get("CONT_MAX_NEW", "48"))
    sync_every = int(os.environ.get("CONT_SYNC_EVERY", "8"))

    cfg = get_config(model).replace(compute_dtype=dtype)
    # serving-quant defaults (DESIGN.md §29), as the HTTP server applies
    # them; CONT_QUANT=0 opts out for the A/B
    if os.environ.get("CONT_QUANT", "1") == "1":
        from whisper_tpu.config import apply_serving_quant
        cfg = apply_serving_quant(cfg)
    # CONT_SQ=1 forces the commuted int8 SELF cache (DESIGN.md §35) on,
    # CONT_SQ=0 forces it off, unset keeps the policy default (sq ships
    # at d>=1024 deep decoders since r4 §35) — the engine's
    # n_text_ctx-slot caches make the self read ~25% of step bytes (vs
    # ~11% at bench.py's 128-slot cap), so the e2e sign can differ from
    # the batch bench's
    if os.environ.get("CONT_SQ") == "1":
        cfg = cfg.replace(self_kv_quant=True)
    elif os.environ.get("CONT_SQ") == "0":
        cfg = cfg.replace(self_kv_quant=False)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        from whisper_tpu.weights import to_device
        params = to_device(params, jnp.bfloat16)
    if cfg.weight_quant:
        from whisper_tpu.models.whisper import quantize_weights_wq
        params = quantize_weights_wq(params, cfg)

    rng = np.random.RandomState(0)
    t = np.arange(cfg.n_samples) / cfg.sample_rate
    clips = [
        (0.3 * np.sin(2 * np.pi * (180 + 25 * i) * t)
         + 0.05 * rng.randn(cfg.n_samples)).astype(np.float32)
        for i in range(min(n_req, 8))
    ]

    def drive(n: int) -> tuple[float, int, list]:
        eng = ContinuousBatcher(params, cfg, max_slots=slots,
                                max_new=max_new, sync_every=sync_every)
        stamps: dict[int, list] = {}

        def on_tok(rid, tid):
            stamps.setdefault(rid, []).append(time.perf_counter())

        for i in range(n):
            eng.submit(clips[i % len(clips)], on_token=on_tok)
        t0 = time.perf_counter()
        out = eng.run_until_idle()
        wall = time.perf_counter() - t0
        gen = sum(len(ids) for ids in out.values()) - n * 4  # minus prompts
        assert len(out) == n
        # per-request median inter-token gap (tokens surface at sync
        # granularity, so this measures the STREAMING cadence a client
        # sees, not the on-chip step wall)
        gaps = []
        for ts in stamps.values():
            if len(ts) > 1:
                d = np.diff(ts)
                gaps.append(float(np.median(d)))
        return wall, gen, gaps

    drive(slots)                         # warmup: compiles fill+step+prefill
    wall, gen, gaps = drive(n_req)

    audio_s = n_req * cfg.chunk_length_s
    print(json.dumps({
        "metric": f"continuous_rtfx_{model}_s{slots}_n{n_req}",
        "value": round(audio_s / wall, 2),
        "unit": "audio_s_per_wall_s",
        "tokens_per_s": round(gen / wall, 1),
        "wall_s": round(wall, 3),
        "gen_tokens": gen,
        "stream_gap_p50_ms": (round(float(np.median(gaps)) * 1e3, 2)
                              if gaps else None),
        "slots": slots,
        "sync_every": sync_every,
        "max_new": max_new,
        "dtype": dtype,
        "quant": {"wq": cfg.weight_quant, "cq": cfg.cross_kv_quant,
                  "sq": cfg.self_kv_quant},
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
