"""int8 MXU dots for the COMPUTE-BOUND encoder — the A/B for DESIGN.md §32.

The question (VERDICT r3 next #1): the decode loop is bandwidth-bound and
there `i8dot` lost to dequant-streaming (§28), but the encoder at
d_model>=1024 is the opposite regime — medium/large/turbo sit at ~36-40%
MXU utilization and v5e int8 MXU peak is ~2x bf16. Do s8xs8
`preferred_element_type=int32` dots (per-output-column weight scales +
dynamic per-token activation scales) buy encoder-phase wall time?

Modes:
  --micro        dot-level A/B at encoder matmul shapes: bf16 dot vs pure
                 s8 dot (act-quant excluded: the MXU ceiling) vs full
                 rowquant+s8dot+rescale (the real candidate)
  --e2e          encoder_forward wall A/B: shipped bf16 path (fused Pallas
                 tail) vs WHISPER_TPU_ENC_I8=1 (XLA int8 projections)

Methodology (CLAUDE.md): chained lax.scan at two chain lengths; the slope
cancels dispatch + fixed costs. Encoder-only walls; no decode.

Usage:
  python benchmarks/enc_i8_ab.py --micro [--d 1024] [--rows 24000]
  python benchmarks/enc_i8_ab.py --e2e --model medium --batch 16
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def _slope(fn, x, n1: int, n2: int, params=None):
    """Seconds per scan step: run chains of n1 and n2 steps, slope cancels
    the dispatch + compile-adjacent fixed costs. `params`, when given, is
    threaded as an explicit jit ARGUMENT — closed-over weights get
    embedded in the serialized program shipped to the remote AOT compiler
    (HTTP 413 at medium+; same lesson as bench.py)."""
    if params is None:
        f1 = jax.jit(functools.partial(fn, steps=n1))
        f2 = jax.jit(functools.partial(fn, steps=n2))
        a = (x,)
    else:
        f1 = jax.jit(functools.partial(fn, steps=n1))
        f2 = jax.jit(functools.partial(fn, steps=n2))
        a = (params, x)
    f1(*a).block_until_ready()   # compile
    f2(*a).block_until_ready()
    t0 = time.perf_counter()
    f1(*a).block_until_ready()
    t1 = time.perf_counter()
    f2(*a).block_until_ready()
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (n2 - n1)


def _rowquant(x):
    """Dynamic per-row symmetric int8: (M, K) -> (int8 (M, K), f32 (M,))."""
    s = jnp.maximum(jnp.max(jnp.abs(x), axis=-1) / 127.0, 1e-10
                    ).astype(jnp.float32)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[:, None]),
                 -127, 127).astype(jnp.int8)
    return q, s


def micro(d: int, rows: int, n1: int, n2: int):
    """fc1+fc2 round trip (K -> 4K -> K) per scan step, three ways."""
    K, N = d, 4 * d
    rng = np.random.RandomState(0)
    w1 = jnp.asarray(rng.randn(K, N).astype(np.float32) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(N, K).astype(np.float32) * 0.02, jnp.bfloat16)
    x0 = jnp.asarray(rng.randn(rows, K).astype(np.float32), jnp.bfloat16)

    def q_cols(w):
        wf = w.astype(jnp.float32)
        s = jnp.maximum(jnp.max(jnp.abs(wf), axis=0) / 127.0, 1e-10)
        return (jnp.clip(jnp.round(wf / s[None, :]), -127, 127
                         ).astype(jnp.int8), s)

    w1q, w1s = q_cols(w1)
    w2q, w2s = q_cols(w2)
    flops_step = 2 * rows * K * N * 2  # fc1 + fc2

    def bf16_chain(x, steps: int):
        def body(h, _):
            y = jnp.dot(h, w1, preferred_element_type=jnp.bfloat16)
            h2 = jnp.dot(y, w2, preferred_element_type=jnp.bfloat16)
            # renormalize so magnitudes stay sane over 200+ steps
            return h2 * (1.0 / jnp.maximum(jnp.max(jnp.abs(h2)), 1e-3)), None
        h, _ = jax.lax.scan(body, x, None, length=steps)
        return h

    def i8_pure_chain(x, steps: int):
        """s8 x s8 dots only — activations quantized ONCE outside the loop
        (not a real serving path; this is the MXU-int8 ceiling)."""
        xq, _ = _rowquant(x)
        def body(carry, _):
            hq = carry
            acc = jax.lax.dot_general(hq, w1q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            # cheap requant: shift back to int8 range (NOT accuracy-correct,
            # but the same op count as a real rescale)
            yq = (acc >> 12).astype(jnp.int8)
            acc2 = jax.lax.dot_general(yq, w2q, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            return (acc2 >> 12).astype(jnp.int8), None
        h, _ = jax.lax.scan(body, xq, None, length=steps)
        return h

    def i8_full_chain(x, steps: int):
        """The real candidate: per-row act quant + s8 dot + f32 rescale."""
        def body(h, _):
            hq, hs = _rowquant(h)
            acc = jax.lax.dot_general(hq, w1q, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            y = (acc.astype(jnp.float32) * (hs[:, None] * w1s[None, :])
                 ).astype(jnp.bfloat16)
            yq, ys = _rowquant(y)
            acc2 = jax.lax.dot_general(yq, w2q, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
            h2 = (acc2.astype(jnp.float32) * (ys[:, None] * w2s[None, :])
                  ).astype(jnp.bfloat16)
            return h2 * (1.0 / jnp.maximum(jnp.max(jnp.abs(h2)), 1e-3)), None
        h, _ = jax.lax.scan(body, x, None, length=steps)
        return h

    out = {}
    for name, fn, xin in (("bf16", bf16_chain, x0),
                          ("i8_pure", i8_pure_chain, x0),
                          ("i8_full", i8_full_chain, x0)):
        s = _slope(fn, xin, n1, n2)
        out[name] = s
        print(f"  {name:8s}: {s*1e3:8.3f} ms/step  "
              f"{flops_step/s/1e12:7.1f} TFLOP/s", flush=True)
    print(f"  i8_pure speedup {out['bf16']/out['i8_pure']:.2f}x, "
          f"i8_full speedup {out['bf16']/out['i8_full']:.2f}x")
    return out


def e2e(model: str, batch: int, n1: int, n2: int):
    from whisper_tpu.config import get_config
    from whisper_tpu.models.whisper import encoder_forward, init_params
    from whisper_tpu.weights import to_device

    cfg = get_config(model).replace(compute_dtype="bfloat16")
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(batch, cfg.n_mels, cfg.n_frames)
                      .astype(np.float32) * 0.5, jnp.bfloat16)

    def enc_chain(p, m, steps: int):
        def body(h, _):
            e = encoder_forward(p, cfg, h)
            # feed a mel-shaped mix back in so the chain is data-dependent
            upd = jnp.mean(e) * 1e-3
            return h + upd.astype(h.dtype), None
        h, _ = jax.lax.scan(body, m, None, length=steps)
        return h

    modes = (("bf16(shipped)", {}),
             ("int8-proj", {"WHISPER_TPU_ENC_I8": "1"}),
             ("int8-tail", {"WHISPER_TPU_ENC_I8K": "1",
                            "WHISPER_TPU_ENC_I8O": "0"}),
             ("int8-tail+o", {"WHISPER_TPU_ENC_I8K": "1"}),
             ("int8-tail+o+q", {"WHISPER_TPU_ENC_I8K": "1",
                                "WHISPER_TPU_ENC_I8Q": "1"}))
    knobs = ("WHISPER_TPU_ENC_I8", "WHISPER_TPU_ENC_I8K",
             "WHISPER_TPU_ENC_I8O", "WHISPER_TPU_ENC_I8Q")
    only = os.environ.get("ENC_AB_ONLY")           # comma list of modes
    for mode, env in modes:
        if only and mode not in only.split(","):
            continue
        for k in knobs:
            os.environ.pop(k, None)
        os.environ.update(env)
        s = _slope(enc_chain, mel, n1, n2, params=params)
        audio_s = batch * cfg.chunk_length_s
        print(f"  {mode:14s}: {s*1e3:8.2f} ms/encode  "
              f"(encoder-phase RTFx {audio_s/s:,.0f})", flush=True)
    for k in knobs:
        os.environ.pop(k, None)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--micro", action="store_true")
    p.add_argument("--e2e", action="store_true")
    p.add_argument("--model", default="medium")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--d", type=int, default=1024)
    p.add_argument("--rows", type=int, default=24_000)
    p.add_argument("--n1", type=int, default=48)
    p.add_argument("--n2", type=int, default=192)
    args = p.parse_args()
    print(f"platform={jax.devices()[0].platform}")
    if args.micro:
        print(f"micro: rows={args.rows} d={args.d} (fc1+fc2 round trip)")
        micro(args.d, args.rows, args.n1, args.n2)
    if args.e2e:
        print(f"e2e encoder: model={args.model} b={args.batch}")
        e2e(args.model, args.batch, args.n1, args.n2)


if __name__ == "__main__":
    main()
