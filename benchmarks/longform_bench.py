"""Single-file long-form transcription wall time on the real chip.

The most common real workload shape — ONE long recording in, text out —
had no measured number (VERDICT r4 weak #7): §34 measured concurrent
SSE aggregate RTFx, bench.py measures batched 30 s clips. This harness
runs a ~N-minute synthetic clip through `LongFormDriver` end-to-end at
the shipped serving defaults and reports wall seconds, RTFx, and window
count. Between a single file's windows the chip sees batch-1 work, so
this is the latency-shaped lower bound on long-form RTFx; LF_FILES>1
shows the concurrency recovery (windows of other files fill the slots).

Reference scope: the reference hard-caps input at one 30 s window
(reference export_weights.py:112-114) — long-form is a capability
extension; the comparison base is its 0.74 s / 30 s clip = 40x.

Knobs (env):
  LF_MODEL    model name                  (default tiny)
  LF_MINUTES  clip length in minutes      (default 10)
  LF_MAX_NEW  generated tokens per window (default 48)
  LF_FILES    concurrent identical files  (default 1)
  LF_SLOTS    engine slots                (default 8)
  LF_SYNC     device steps per readback   (default 8)
  LF_QUANT    0 disables apply_serving_quant (default 1)
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
    from whisper_tpu.serving_longform import LongFormDriver

    model = os.environ.get("LF_MODEL", "tiny")
    minutes = float(os.environ.get("LF_MINUTES", "10"))
    max_new = int(os.environ.get("LF_MAX_NEW", "48"))
    n_files = int(os.environ.get("LF_FILES", "1"))
    slots = int(os.environ.get("LF_SLOTS", "8"))
    sync_every = int(os.environ.get("LF_SYNC", "8"))

    cfg = get_config(model).replace(compute_dtype="bfloat16")
    if os.environ.get("LF_QUANT", "1") == "1":
        from whisper_tpu.config import apply_serving_quant
        cfg = apply_serving_quant(cfg)
    params = init_params(cfg, jax.random.PRNGKey(0))
    from whisper_tpu.weights import to_device
    params = to_device(params, jnp.bfloat16)
    if cfg.weight_quant:
        from whisper_tpu.models.whisper import quantize_weights_wq
        params = quantize_weights_wq(params, cfg)

    # deterministic tone+noise "speech": long enough for ceil(60*min/30)
    # windows, amplitude over the VAD floor everywhere (no window skips —
    # the number measures compute, not silence shortcuts)
    n_samples = int(minutes * 60 * cfg.sample_rate)
    rng = np.random.RandomState(0)
    t = np.arange(n_samples) / cfg.sample_rate
    audio = (0.3 * np.sin(2 * np.pi * (160 + 40 * np.sin(0.07 * t)) * t)
             + 0.05 * rng.randn(n_samples)).astype(np.float32)

    def run_once(files: int):
        eng = ContinuousBatcher(params, cfg, max_slots=slots,
                                max_new=max_new, sync_every=sync_every)
        eng.warmup()
        drv = LongFormDriver(eng, condition_on_previous=True)
        t0 = time.perf_counter()
        fids = [drv.submit(audio) for _ in range(files)]
        results = drv.run()
        wall = time.perf_counter() - t0
        return wall, [results[f] for f in fids]

    # warmup pass on a 2-window slice (compiles fill/prefill/step)
    short = audio[:2 * cfg.n_samples]
    eng_w = ContinuousBatcher(params, cfg, max_slots=slots,
                              max_new=max_new, sync_every=sync_every)
    eng_w.warmup()
    LongFormDriver(eng_w).submit(short)
    eng_w.run_until_idle()

    wall, res = run_once(n_files)
    windows = res[0].windows
    audio_s = minutes * 60 * n_files
    print(json.dumps({
        "metric": f"longform_rtfx_{model}_{int(minutes)}min_f{n_files}",
        "value": round(audio_s / wall, 2),
        "unit": "audio_s_per_wall_s",
        "wall_s": round(wall, 3),
        "windows_per_file": windows,
        "gen_tokens_per_window": max_new,
        "files": n_files, "slots": slots, "sync_every": sync_every,
        "quant": {"wq": cfg.weight_quant, "cq": cfg.cross_kv_quant,
                  "sq": cfg.self_kv_quant, "i8k": cfg.encoder_mlp_quant,
                  "i8q": cfg.encoder_qkv_quant},
    }))


if __name__ == "__main__":
    main()
