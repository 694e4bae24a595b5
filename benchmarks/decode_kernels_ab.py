"""A/B microbenchmarks for the q_len==1 decode-attention kernels on the real
TPU (VERDICT r1 Next #2: make the kernels win at Whisper shapes, then lower
the dispatch thresholds).

Measures, at the shapes production actually hits —
    self-attn:  S=448  (n_text_ctx),  kv_len ~ 93 (prompt+mid-decode)
    cross-attn: S=1500 (n_audio_ctx), kv_len = 1500
for batch {8, 32}, bf16 —
    * XLA reference attention (mha_reference)
    * decode_attention_bh at block_k in {128, 256, 512, 768}
    * decode_attention (per-(b,h) grid) at block_k 128 for reference

Timing discipline (CLAUDE.md): per-dispatch host overhead through the axon
tunnel is ~30 ms, so each variant runs ITERS chained calls inside ONE jitted
lax.scan (the output feeds the next query so XLA cannot CSE or hoist the
call) and reports wall/ITERS.

Usage: python benchmarks/decode_kernels_ab.py [--iters 200] [--out file]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def timed_chain(fn, q0, iters: int) -> float:
    """Seconds per call of fn(q) -> (B,1,H,D), chained q <- out.

    The axon tunnel costs ~30 ms per host->device dispatch, which at N
    chained iterations shows up as 30ms/N of apparent per-call time. Two
    chain lengths (N and N/4) cancel the fixed cost: slope = (w_N - w_N4)
    / (N - N/4)."""

    def make_chain(n):
        @jax.jit
        def chain(q):
            def body(q, _):
                out = fn(q)
                return out.astype(q.dtype), ()
            q, _ = jax.lax.scan(body, q, None, length=n)
            return q
        return chain

    long_c, short_c = make_chain(iters), make_chain(iters // 4)

    def median_wall(c):
        c(q0).block_until_ready()            # compile
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            c(q0).block_until_ready()
            times.append(time.perf_counter() - t0)
        return float(np.median(times))

    w_long, w_short = median_wall(long_c), median_wall(short_c)
    return max(w_long - w_short, 0.0) / (iters - iters // 4)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=200)
    p.add_argument("--out", default=None)
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--only", default=None,
                   help="comma list of variant-name substrings to run")
    p.add_argument("--batches", default="8,32")
    args = p.parse_args()

    from whisper_tpu.ops.attention import mha_reference
    from whisper_tpu.ops.decode_attention import (
        decode_attention,
        decode_attention_bg,
        decode_attention_bh,
    )

    H, D = 6, 64
    dtype = jnp.dtype(args.dtype)
    shapes = [
        ("self_S448_len93", 448, 93),
        ("cross_S1500", 1500, 1500),
    ]
    rows = []
    for B in tuple(int(b) for b in args.batches.split(",")):
        for name, S, kv_len in shapes:
            key = jax.random.PRNGKey(0)
            kq, kk, kv = jax.random.split(key, 3)
            q0 = jax.random.normal(kq, (B, 1, H, D), dtype)
            k = jax.random.normal(kk, (B, H, S, D), dtype)
            v = jax.random.normal(kv, (B, H, S, D), dtype)
            bw_bytes = 2 * B * H * kv_len * D * dtype.itemsize
            variants = {
                "xla": lambda q: mha_reference(q, k, v, kv_len),
            }
            for bk in (128, 256, 512, 768):
                if bk <= S or bk == 128:
                    variants[f"bh_bk{bk}"] = functools.partial(
                        lambda q, bk: decode_attention_bh(
                            q, k, v, kv_len, block_k=bk), bk=bk)
            variants["perhead_bk128"] = lambda q: decode_attention(
                q, k, v, kv_len, block_k=128)
            for bb in (4, 8, 16, 32):
                if B % bb:
                    continue
                for bk in (128, 256):
                    variants[f"bg_bb{bb}_bk{bk}"] = functools.partial(
                        lambda q, bb, bk: decode_attention_bg(
                            q, k, v, kv_len, block_b=bb, block_k=bk),
                        bb=bb, bk=bk)
            if args.only:
                keys = args.only.split(",")
                variants = {n: f for n, f in variants.items()
                            if any(s in n for s in keys)}
            for vname, fn in variants.items():
                us = timed_chain(fn, q0, args.iters) * 1e6
                floor_us = bw_bytes / 819e9 * 1e6
                row = {"shape": name, "batch": B, "variant": vname,
                       "us_per_call": round(us, 1),
                       "floor_us": round(floor_us, 1),
                       "x_floor": round(us / floor_us, 2)}
                rows.append(row)
                print(json.dumps(row), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
