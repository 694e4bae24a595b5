"""A/B: chain G micro-batches inside ONE jitted program to amortize the
axon tunnel's per-program dispatch cost.

DESIGN.md §18 measured the b32 steady-state residual: ~55 ms/batch over
the ~70 ms on-chip compute sum, non-overlappable by async dispatch
(K=16 as flat as K=8). Split mode issues 2 programs per batch
(prefill | loop, §13), so the fixed cost is ~27 ms/program execution.

This harness keeps the split structure — the loop still compiles in a
program containing no encoder (the §13 win) — but each program now
processes G micro-batches sequentially via `lax.map`:

    stage1_g: (G, B, samples) -> stacked (cross_kv, cache, tokens, logits)
    loop_g:   stacked state  -> stacked DecodeResult

so the per-execution tunnel cost divides by G. Expected per-batch time
~= compute + 55/G ms; risk is the §13 pathology reappearing (the loop
sharing its program with G-1 sibling loops may change XLA's
fusion/allocation around the while body) — hence this measurement.

Run on the real chip:  python benchmarks/chained_dispatch.py
Env: CHAIN_GS=1,4,8  CHAIN_BATCH=32  CHAIN_REPEATS=3
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH = int(os.environ.get("CHAIN_BATCH", "32"))
GEN_TOKENS = 89
REPEATS = int(os.environ.get("CHAIN_REPEATS", "3"))
GS = tuple(int(g) for g in os.environ.get("CHAIN_GS", "1,4,8").split(","))
# "both": lax.map over both stages (one program pair per G batches).
# "stage1": chain ONLY the feed-forward stage (G unrolled encoder+prefill
#   copies in one program, G separate pytree outputs — no device slicing),
#   keeping each decode loop its OWN program (the DESIGN.md §13 win);
#   programs per batch drop 2 -> 1 + 1/G.
MODE = os.environ.get("CHAIN_MODE", "both")


def main() -> None:
    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import _greedy_loop, _greedy_prefill
    from whisper_tpu.models.whisper import encoder_forward, init_params
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    cfg = get_config("tiny").replace(compute_dtype="bfloat16")
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (BATCH, 1)), jnp.int32)
    P = prompt.shape[1]
    total = P + GEN_TOKENS

    bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
    bias = bias.at[cfg.eot_token].set(-1e9)

    rng = np.random.RandomState(0)
    t = np.arange(cfg.n_samples) / cfg.sample_rate
    audio = np.stack([
        0.3 * np.sin(2 * np.pi * (200 + 40 * b) * t)
        + 0.05 * rng.randn(cfg.n_samples)
        for b in range(BATCH)
    ]).astype(np.float32)

    results = {}
    for G in GS:
        audio_g = jnp.asarray(np.broadcast_to(audio, (G, BATCH, audio.shape[1])))

        def stage1_one(a):
            mel = log_mel_spectrogram(a, cfg)
            enc = encoder_forward(params, cfg, mel)
            return _greedy_prefill(params, cfg, enc, prompt, total)

        def loop_one(pre):
            cross, cache, tokens, logits = pre
            return _greedy_loop(params, cfg, cross, cache, tokens, logits,
                                prompt, bias, jax.random.PRNGKey(0),
                                opts=None, max_new=GEN_TOKENS - 1)

        if G == 1:
            stage1_g = jax.jit(lambda ag: stage1_one(ag[0]))
            loop_g = jax.jit(lambda pre: loop_one(pre))

            def run(ag):
                return [loop_g(stage1_g(ag))]
        elif MODE == "stage1":
            stage1_g = jax.jit(
                lambda ag: tuple(stage1_one(ag[i]) for i in range(G)))
            loop_j = jax.jit(loop_one)

            def run(ag):
                return [loop_j(pre) for pre in stage1_g(ag)]
        else:
            stage1_g = jax.jit(lambda ag: jax.lax.map(stage1_one, ag))
            loop_g = jax.jit(lambda pre: jax.lax.map(loop_one, pre))

            def run(ag):
                return [loop_g(stage1_g(ag))]

        def sync(res):
            for r in res:
                r.tokens.block_until_ready()

        t0 = time.perf_counter()
        sync(run(audio_g))
        compile_s = time.perf_counter() - t0

        times = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            sync(run(audio_g))
            times.append(time.perf_counter() - t0)
        p50 = float(np.median(times))
        per_batch = p50 / G
        rtfx = BATCH * cfg.chunk_length_s / per_batch

        # steady-state: enqueue 2 chained calls back-to-back (async),
        # sync once — matches bench.py's pipelined drive mode
        t0 = time.perf_counter()
        rs = [run(audio_g) for _ in range(2)]
        for res in rs:
            sync(res)
        steady_per_batch = (time.perf_counter() - t0) / (2 * G)
        steady_rtfx = BATCH * cfg.chunk_length_s / steady_per_batch

        results[G] = dict(per_batch_ms=round(per_batch * 1e3, 1),
                          rtfx=round(rtfx, 1),
                          steady_per_batch_ms=round(steady_per_batch * 1e3, 1),
                          steady_rtfx=round(steady_rtfx, 1),
                          compile_s=round(compile_s, 1))
        print(json.dumps({"G": G, **results[G]}), flush=True)

    print(json.dumps({"batch": BATCH, "results": {str(k): v for k, v in
                                                  results.items()}}))


if __name__ == "__main__":
    main()
