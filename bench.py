"""Benchmark: batched Whisper-Tiny greedy transcription RTFx per chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Baseline: the reference engine transcribes one 30 s clip in 0.74 s on a
multicore CPU (reference readme.md:82) => RTFx ~= 40.5 single-stream. The
north-star target (BASELINE.json) is >=100x real-time *batched* per TPU v5e
chip. This harness measures end-to-end on-device work — log-mel frontend +
encoder + 4-token prefill + an 89-token greedy decode (matching the
reference clip's 89 golden tokens, expected_tokens.txt) — on random tiny
weights (real checkpoints are unavailable offline; the compute is
weight-value-independent since the step count is fixed).

Headline config = the serving sweet spot measured on v5e: bfloat16, batch
32, steady-state stage1-chained dispatch + int8 serving-quant defaults
(r3 final: tiny b32 15,653 RTFx steady after the fused encoder tail,
in-place cache append, right-sized self cache, weight-only int8 and
scale-commuted int8 cross — DESIGN.md §15, §18-§20, §24, §28-§29;
r4 adds the in-kernel int8 encoder MLP + o-projection at d>=768, the
bq512 block at d=1280, and the XLA int8 QKV hybrid at d>=1024 —
§32b/§35: medium 754.4, large-v2 433.9, large-v3 434.1, turbo 1,124.5).
fp32 batch 8, the token-parity configuration, measured 1530 RTFx in r1;
env knobs below select any variant (WHISPER_BENCH_PIPELINE=0 restores
the sync-p50 headline, WHISPER_BENCH_MODEL sweeps the family).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Persistent compilation cache: repeat bench runs (and driver re-runs) skip
# the multi-minute XLA compile of the full e2e program.
jax.config.update("jax_compilation_cache_dir",
                  os.environ.get("JAX_CACHE_DIR", "/root/.cache/jax"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

BATCH = int(os.environ.get("WHISPER_BENCH_BATCH", "32"))
GEN_TOKENS = 89          # decode exactly as many tokens as the golden clip
BASELINE_RTFX = 30.0 / 0.74
REPEATS = 5
# knobs for A/B runs (defaults match the headline config)
DTYPE = os.environ.get("WHISPER_BENCH_DTYPE", "bfloat16")
BACKEND = os.environ.get("WHISPER_TPU_ATTN")     # None = auto
KV_QUANT = os.environ.get("WHISPER_BENCH_KVQUANT", "0") == "1"
# "auto" (default) = the WhisperPipeline serving policy (config.
# apply_serving_quant): bf16 runs weight-only int8 + scale-commuted int8
# cross-KV where measured-best (all widths except the d=768 cq carve-out
# — DESIGN.md §29/§29b); fp32 parity mode stays unquantized. "0"/"1"
# force. Resolved per-model in main().
_CROSS_ENV = os.environ.get("WHISPER_BENCH_CROSSQUANT", "auto")
_WQ_ENV = os.environ.get("WHISPER_BENCH_WQ", "auto")
_ENC_I8K_ENV = os.environ.get("WHISPER_BENCH_ENC_I8K", "auto")
_ENC_I8Q_ENV = os.environ.get("WHISPER_BENCH_ENC_I8Q", "auto")
_SQ_ENV = os.environ.get("WHISPER_BENCH_SQ", "auto")
CROSS_QUANT = _CROSS_ENV == "1"   # pre-resolution values for the JSON line
WQ = _WQ_ENV == "1"
ENC_I8K = _ENC_I8K_ENV == "1"
ENC_I8Q = _ENC_I8Q_ENV == "1"
SQ = _SQ_ENV == "1"


def make_chained_runner(cfg, params, prompt, gen_tokens: int, G: int,
                        logit_bias=None):
    """Build the stage1-chained dispatch runner: ONE program computes G
    micro-batches' [mel + encoder + prefill] (G unrolled copies returning G
    separate output pytrees — no device-side slicing, which would cost a
    dispatch each), then every decode loop dispatches as its OWN program —
    preserving the §13 own-program compilation win. Programs per batch
    drop from 2 to 1 + 1/G, amortizing the axon tunnel's ~27 ms/program
    fixed cost on the stage1 side (DESIGN.md §19).

    Measured v5e tiny bf16 b32 (benchmarks/chained_dispatch.py): chaining
    BOTH stages via lax.map is a definitive negative (G=4/8: 176 ms/batch
    vs 138.6 unchained — the mapped loop loses its own-program
    compilation); stage1-only chaining wins: G=8 123.3 ms/batch steady.

    Returns run(audio_g: (G, B, n_samples)) -> list of G DecodeResults;
    per-slot results are token-identical to the eager split path
    (tests/test_chained_dispatch.py)."""
    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.decode import _greedy_prefill, _jit_greedy_loop
    from whisper_tpu.models.whisper import encoder_forward

    total = prompt.shape[1] + gen_tokens

    def stage1_one(p, a):
        mel = log_mel_spectrogram(a, cfg)
        enc = encoder_forward(p, cfg, mel)
        return _greedy_prefill(p, cfg, enc, prompt, total)

    # params MUST be an explicit argument: closed-over weights are embedded
    # in the serialized program shipped to the remote AOT compiler — at
    # small-bf16 that is a ~470 MB request body (HTTP 413 through the axon
    # tunnel). As an argument they are just a parameter shape.
    stage1_g = jax.jit(
        lambda p, ag: tuple(stage1_one(p, ag[i]) for i in range(G)))

    def run(audio_g):
        # _jit_greedy_loop is the same jitted program the eager split path
        # uses — one compile serves both drive modes
        return [
            _jit_greedy_loop(params, cfg, cross, cache, tokens, logits,
                             prompt, logit_bias, jax.random.PRNGKey(0),
                             opts=None, max_new=gen_tokens - 1)
            for cross, cache, tokens, logits in stage1_g(params, audio_g)
        ]

    return run


def main() -> None:
    from whisper_tpu.audio import log_mel_spectrogram
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import greedy_decode
    from whisper_tpu.models.whisper import encoder_forward, init_params
    from whisper_tpu.tokenizer import build_prompt

    model = os.environ.get("WHISPER_BENCH_MODEL", "tiny")
    from whisper_tpu.config import apply_serving_quant
    global WQ, CROSS_QUANT, ENC_I8K, ENC_I8Q, SQ
    base_cfg = get_config(model).replace(compute_dtype=DTYPE,
                                         attn_backend=BACKEND,
                                         kv_cache_quant=KV_QUANT)
    auto = apply_serving_quant(base_cfg, batch=BATCH)
    WQ = auto.weight_quant if _WQ_ENV == "auto" else _WQ_ENV == "1"
    CROSS_QUANT = (auto.cross_kv_quant if _CROSS_ENV == "auto"
                   else _CROSS_ENV == "1")
    ENC_I8K = (auto.encoder_mlp_quant if _ENC_I8K_ENV == "auto"
               else _ENC_I8K_ENV == "1")
    ENC_I8Q = (auto.encoder_qkv_quant if _ENC_I8Q_ENV == "auto"
               else _ENC_I8Q_ENV == "1")
    SQ = auto.self_kv_quant if _SQ_ENV == "auto" else _SQ_ENV == "1"
    cfg = base_cfg.replace(cross_kv_quant=CROSS_QUANT, weight_quant=WQ,
                           encoder_mlp_quant=ENC_I8K,
                           encoder_qkv_quant=ENC_I8Q,
                           self_kv_quant=SQ)
    params = init_params(cfg, jax.random.PRNGKey(0))
    if DTYPE == "bfloat16":
        from whisper_tpu.weights import to_device
        params = to_device(params, jnp.bfloat16)
    if WQ:
        from whisper_tpu.models.whisper import quantize_weights_wq
        params = quantize_weights_wq(params, cfg)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (BATCH, 1)), jnp.int32)

    rng = np.random.RandomState(0)
    t = np.arange(cfg.n_samples) / cfg.sample_rate
    audio = np.stack([
        0.3 * np.sin(2 * np.pi * (200 + 40 * b) * t)
        + 0.05 * rng.randn(cfg.n_samples)
        for b in range(BATCH)
    ]).astype(np.float32)
    audio_dev = jnp.asarray(audio)

    from whisper_tpu.decode import _greedy_prefill, _jit_greedy_loop

    # logit_bias forbids EOT so every row decodes the full GEN_TOKENS
    # (fixed work, independent of random-weight argmax behavior)
    bias = jnp.zeros((cfg.vocab_size,), jnp.float32)
    bias = bias.at[cfg.eot_token].set(-1e9)
    total = prompt.shape[1] + GEN_TOKENS

    # Two execution modes (WHISPER_BENCH_SPLIT=0 selects one-jit):
    #  * split (default): [mel+encoder+prefill] | [decode loop] as two
    #    programs chained by async dispatch — the decode loop compiled as
    #    its own program runs up to 3x faster per step (DESIGN.md §13).
    #    Measured on the final r2 code, v5e through the axon tunnel:
    #    b32 6021 vs 4648 RTFx, b8 3281 vs 2659 — the loop savings beat
    #    the ~30 ms extra dispatch at every batch.
    #  * one-jit: everything in a single program (the r1 configuration).
    if os.environ.get("WHISPER_BENCH_SPLIT", "1") == "1":
        @jax.jit
        def stage1(params, audio, prompt):
            mel = log_mel_spectrogram(audio, cfg)
            enc = encoder_forward(params, cfg, mel)
            return _greedy_prefill(params, cfg, enc, prompt, total)

        def run(params, audio, prompt):
            cross, cache, tokens, logits = stage1(params, audio, prompt)
            return _jit_greedy_loop(params, cfg, cross, cache, tokens,
                                    logits, prompt, bias,
                                    jax.random.PRNGKey(0),
                                    opts=None, max_new=GEN_TOKENS - 1)
    else:
        @jax.jit
        def run(params, audio, prompt):
            mel = log_mel_spectrogram(audio, cfg)
            enc = encoder_forward(params, cfg, mel)
            return greedy_decode(params, cfg, enc, prompt,
                                 max_new=GEN_TOKENS - 1, logit_bias=bias)

    # warmup/compile
    res = run(params, audio_dev, prompt)
    res.tokens.block_until_ready()

    times = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        res = run(params, audio_dev, prompt)
        res.tokens.block_until_ready()
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    latency_rtfx = BATCH * cfg.chunk_length_s / p50

    # Steady-state throughput: K batches enqueued back-to-back, synced once
    # at the end. JAX async dispatch overlaps the axon tunnel's ~30 ms fixed
    # per-dispatch cost with on-chip compute — exactly how the serving host
    # drives the chip (server.py pumps the next batch while the current one
    # runs). The sync p50 above charges that host round-trip to every batch;
    # the steady number measures the chip. WHISPER_BENCH_PIPELINE=0 restores
    # the sync p50 as the headline value.
    K = int(os.environ.get("WHISPER_BENCH_PIPELINE", "8"))
    # Chained dispatch (DESIGN.md §19): G micro-batches' stage1 per program
    # (loops stay own-program) — divides the tunnel's per-program fixed
    # cost by ~2x on top of the async pipelining. WHISPER_BENCH_CHAIN=0
    # disables (G=8 is the measured default). G is clamped so the G live
    # stage1 outputs fit HBM: the dominant term is the precomputed cross-KV
    # (L_dec x B x H x 1500 x D x2 tensors); small-bf16 at G=8 holds
    # 8 x 1.77 GB of cross-KV -> RESOURCE_EXHAUSTED on the 16 GB chip.
    # Chaining amortizes the ~30 ms tunnel dispatch — decisive at tiny
    # (§19) but a measured NEGATIVE once per-batch programs reach ~1 s:
    # large-v2 b16 wq+cq is 370.6 RTFx at chain2 vs 388.6 unchained
    # steady8 (the chained barrier + extra live cross-KV outrank the
    # dispatch saving). Default chain off for the 32-layer larges; turbo
    # (4-layer decoder, tiny-like step times) keeps chain8.
    default_g = "1" if (cfg.d_model >= 1280 and cfg.n_text_layers >= 32) \
        else "8"
    G = int(os.environ.get("WHISPER_BENCH_CHAIN", default_g))
    itemsize = 2 if DTYPE == "bfloat16" else 4
    ckv_elems = (2 * cfg.n_text_layers * BATCH * cfg.n_heads
                 * cfg.n_audio_ctx * (cfg.d_model // cfg.n_heads))
    cross_bytes = (ckv_elems + ckv_elems * 4 // (cfg.d_model // cfg.n_heads)
                   if CROSS_QUANT else ckv_elems * itemsize)  # int8 + scales
    per_ub = (cross_bytes
              + BATCH * cfg.n_audio_ctx * cfg.d_model * itemsize  # enc out
              + BATCH * cfg.n_samples * 4)                     # audio f32
    # HBM model, calibrated on the chip: G live micro-batches + resident
    # weights + the running loop's cross-KV layout copies (~2x one
    # micro-batch's cross: XLA transposes both k and v into the loop's
    # preferred layout) must fit ~13.5 GiB of the 15.75 GiB chip.
    # Reproduces every measured outcome: turbo G=8 runs (12.2 GB), small
    # G=8 OOMs -> 5 runs, medium-b16 G=4 OOMs (15.6 GB) -> 3.
    weight_bytes = sum(x.size * x.dtype.itemsize
                       for x in jax.tree.leaves(params))
    hbm_avail = int(13.5 * (1 << 30)) - weight_bytes - 2 * cross_bytes
    if CROSS_QUANT or WQ:
        # The quantized modes sit outside the 13.5 GiB calibration: medium
        # b16 wq+cq OOMed at the model's edge-exact G=8 (compiled loop
        # temps 0.66 GiB + stage1 temps are unmodeled; the 2*cross reserve
        # no longer covers them once cross_bytes is int8-sized). Reserve a
        # measured-conservative 2 GiB until these modes are recalibrated.
        hbm_avail -= 2 * (1 << 30)
    G = max(1, min(G, hbm_avail // per_ub))
    if G > 1:
        chained = make_chained_runner(cfg, params, prompt, GEN_TOKENS, G,
                                      logit_bias=bias)
        audio_g = jnp.asarray(np.broadcast_to(
            audio, (G,) + audio.shape).copy())
        for r in chained(audio_g):                     # warmup/compile
            r.tokens.block_until_ready()
        # Enqueued executions allocate their output buffers immediately:
        # k_outer chained programs hold k_outer*G micro-batches of stage1
        # outputs live at once. Clamp the total in-flight footprint (the
        # unclamped medium run held ~20 GB of cross-KV: OOM).
        k_outer = max(K // G, 2)
        k_outer = max(1, min(k_outer, hbm_avail // (per_ub * G)))
        # first measurement immediately after a fresh ~10-min compile has
        # once produced a physically impossible wall (blocks returning
        # instantly); re-measure until the number is plausible vs the sync
        # p50 (steady can legitimately beat sync ~2x, never 10x)
        for _ in range(3):
            t0 = time.perf_counter()
            results = [chained(audio_g) for _ in range(k_outer)]
            for rs in results:
                for r in rs:
                    r.tokens.block_until_ready()
            per_batch = (time.perf_counter() - t0) / (k_outer * G)
            if per_batch > p50 / 8:
                break
    elif K > 1:
        t0 = time.perf_counter()
        results = [run(params, audio_dev, prompt) for _ in range(K)]
        for r in results:
            r.tokens.block_until_ready()
        steady_wall = time.perf_counter() - t0
        per_batch = steady_wall / K
    else:
        per_batch = p50
    rtfx = BATCH * cfg.chunk_length_s / per_batch
    # Roofline accounting (VERDICT r1 Next #7): MFU vs the v5e bf16 peak and
    # the fraction of the phase-summed compute/HBM floor this run achieved.
    from whisper_tpu.utils.perf_model import workload_cost
    cost = workload_cost(cfg, BATCH, prompt.shape[1], GEN_TOKENS)
    print(json.dumps({
        "metric": f"rtfx_per_chip_{model}_b{BATCH}_greedy89",
        "value": round(rtfx, 2),
        "unit": "audio_s_per_wall_s",
        "vs_baseline": round(rtfx / BASELINE_RTFX, 2),
        "mode": (f"chain{G}" if G > 1 else
                 f"steady{K}" if K > 1 else "sync"),
        "p50_e2e_s": round(p50, 4),
        "latency_rtfx": round(latency_rtfx, 2),
        "per_batch_s": round(per_batch, 4),
        "batch": BATCH,
        "dtype": DTYPE,
        "attn": BACKEND or "auto",
        "kv_quant": KV_QUANT,
        "weight_quant": WQ,
        "cross_quant": CROSS_QUANT,
        "enc_i8k": ENC_I8K,
        "enc_i8q": ENC_I8Q,
        "self_quant": SQ,
        "achieved_tflops": round(cost.flops / per_batch / 1e12, 2),
        "mfu_pct": round(100 * cost.mfu(per_batch), 2),
        "sol_pct": round(100 * cost.sol_frac(per_batch), 1),
        "floor_s": round(cost.floor_s, 4),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
