"""A/B: weight-only int8 for the decode loop's weight-bound matmuls.

Question (NEXT.md P1 #2): medium/large per-step weight reads are
0.7-1.9 GB bf16. Per-OUTPUT-COLUMN int8 scales commute with the matmul —
x @ (w_q * s_col) == (x @ w_q) * s_col — so the dequant can be applied to
the (tiny) output instead of the (huge) weight. Whether that halves HBM
traffic depends entirely on XLA's lowering of the int8->bf16 convert:
fused into the dot's operand read = win; materialized as a full bf16 copy
per step = 1.5x the traffic (the §16 cross-KV int8 pathology).

Three formulations, measured as chained-scan slopes (the §13 methodology —
dispatch cancels) over a stacked-layer scan mimicking the real decode
step's weight stream:
  bf16:    y @ W1 @ W2, weights bf16                       (baseline)
  deq:     y @ (W1_q -> bf16) * s1 ...                     (convert-in-graph)
  deqout:  (y @ (W1_q -> bf16)) * s_col ...                (scale on output;
           identical products when s is per-column, so XLA may DCE nothing
           but the convert placement differs)
  i8dot:   dynamic per-row activation quant, s8 x s8 -> s32 MXU dot,
           rescale (different numerics — accuracy handled separately)

Run: python benchmarks/wq_ab.py [--d 1024] [--layers 24] [--batch 16]
"""

from __future__ import annotations

import argparse
import functools
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


def quant_cols(w):
    """Per-output-column symmetric int8: w (in, out) -> (int8, (out,) f32)."""
    s = jnp.max(jnp.abs(w), axis=0) / 127.0
    s = jnp.maximum(s, 1e-10)
    q = jnp.clip(jnp.round(w / s[None, :]), -127, 127).astype(jnp.int8)
    return q, s.astype(jnp.float32)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=1024)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=96)
    ap.add_argument("--steps2", type=int, default=288)
    args = ap.parse_args()
    d, L, B = args.d, args.layers, args.batch

    key = jax.random.PRNGKey(0)
    k1, k2, kx = jax.random.split(key, 3)
    w1 = jax.random.normal(k1, (L, d, 4 * d), jnp.float32) * 0.02
    w2 = jax.random.normal(k2, (L, 4 * d, d), jnp.float32) * 0.02
    x0 = jax.random.normal(kx, (B, d), jnp.bfloat16)

    w1b, w2b = w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
    w1q, s1 = jax.vmap(quant_cols)(w1)
    w2q, s2 = jax.vmap(quant_cols)(w2)
    jax.block_until_ready((w1b, w2b, w1q, s1, w2q, s2))

    def body_bf16(x, wl):
        a, b = wl
        y = jnp.dot(x, a, preferred_element_type=jnp.float32)
        y = jax.nn.gelu(y.astype(jnp.bfloat16))
        y = jnp.dot(y, b, preferred_element_type=jnp.float32)
        return (x + y.astype(jnp.bfloat16) * 0.01), None

    def body_deq(x, wl):
        (aq, sa), (bq, sb) = wl
        a = aq.astype(jnp.bfloat16) * sa.astype(jnp.bfloat16)[None, :]
        b = bq.astype(jnp.bfloat16) * sb.astype(jnp.bfloat16)[None, :]
        y = jnp.dot(x, a, preferred_element_type=jnp.float32)
        y = jax.nn.gelu(y.astype(jnp.bfloat16))
        y = jnp.dot(y, b, preferred_element_type=jnp.float32)
        return (x + y.astype(jnp.bfloat16) * 0.01), None

    def body_deqout(x, wl):
        (aq, sa), (bq, sb) = wl
        y = jnp.dot(x, aq.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * sa[None, :]
        y = jax.nn.gelu(y.astype(jnp.bfloat16))
        y = jnp.dot(y, bq.astype(jnp.bfloat16),
                    preferred_element_type=jnp.float32) * sb[None, :]
        return (x + y.astype(jnp.bfloat16) * 0.01), None

    def body_i8dot(x, wl):
        (aq, sa), (bq, sb) = wl

        def qdot(v, wq, sw):
            sv = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=-1,
                         keepdims=True) / 127.0
            sv = jnp.maximum(sv, 1e-10)
            vq = jnp.clip(jnp.round(v.astype(jnp.float32) / sv), -127, 127
                          ).astype(jnp.int8)
            acc = jax.lax.dot_general(
                vq, wq, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * sv * sw[None, :]

        y = qdot(x, aq, sa)
        y = jax.nn.gelu(y.astype(jnp.bfloat16))
        y = qdot(y, bq, sb)
        return (x + y.astype(jnp.bfloat16) * 0.01), None

    bodies = {
        "bf16": (body_bf16, (w1b, w2b)),
        "deq": (body_deq, ((w1q, s1), (w2q, s2))),
        "deqout": (body_deqout, ((w1q, s1), (w2q, s2))),
        "i8dot": (body_i8dot, ((w1q, s1), (w2q, s2))),
    }

    @functools.partial(jax.jit, static_argnames=("name", "steps"))
    def run(x, weights, name, steps):
        body, _ = bodies[name]

        def step(x, _):
            y, _ = jax.lax.scan(body, x, weights)
            return y, None

        y, _ = jax.lax.scan(step, x, None, length=steps)
        return y

    def wall(name, weights, steps):
        # time via host fetch, not block_until_ready: the axon client has
        # been observed returning early from block_until_ready in fresh
        # processes (r4); the ~33 ms readback is constant and cancels in
        # the two-length slope fit
        np.asarray(run(x0, weights, name=name, steps=steps))   # compile
        t0 = time.perf_counter()
        np.asarray(run(x0, weights, name=name, steps=steps))
        return time.perf_counter() - t0

    # per-step weight bytes for the roofline line
    wbytes_bf16 = (w1.size + w2.size) * 2
    out = {"d": d, "layers": L, "batch": B,
           "weight_mb_per_step_bf16": round(wbytes_bf16 / 1e6, 1)}
    for name, (_, weights) in bodies.items():
        t1 = wall(name, weights, args.steps)
        t2 = wall(name, weights, args.steps2)
        slope = (t2 - t1) / (args.steps2 - args.steps)
        out[name + "_us_per_step"] = round(slope * 1e6, 1)
    # v5e HBM ~819 GB/s: bf16 floor and the int8 target
    out["floor_bf16_us"] = round(wbytes_bf16 / 819e9 * 1e6, 1)
    out["floor_int8_us"] = round(wbytes_bf16 / 2 / 819e9 * 1e6, 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
