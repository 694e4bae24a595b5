"""Why does scale-commuted int8 cross-KV (cq) lose at exactly d_model=768?

DESIGN.md §29b measured cq as a −3.7% e2e negative at small (d=768,
H=12) while winning at base (512, +16%) and medium/large (≥1024, +14-18%)
— the one carve-out in `apply_serving_quant`, closed "by assertion"
(VERDICT r4 weak #5). This probe decomposes it:

1. ISOLATED cross-attention step forms, chained on-device (two chain
   lengths cancel dispatch; §25 methodology): the bf16 route vs the
   commuted route at t8 ∈ {0, 4, 8, 16}, plus a split-tile variant
   (score dot tiled, pv dot untiled) — at base/small/medium widths.
   If the isolated commuted form already loses at 768 only, it's the
   einsum lowering at H=12; if isolation wins everywhere, the e2e loss
   is integration (fusion/layout inside the full step — §22's class).

2. (--hlo) TPU HLO of the FULL decode step (decoder_step_ip) with cq
   on/off at 512/768/1024: fusion count, where the (B,H,1,S) scale
   multiplies land, estimated cycles (ratios are meaningful, §25).

Usage: python benchmarks/cq768_probe.py [--batch 32] [--models small]
       python benchmarks/cq768_probe.py --hlo --models base,small,medium
"""

from __future__ import annotations

import argparse
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


def chain_time(body, x0, iters: int) -> float:
    """Median per-iteration seconds of a scanned body, dispatch-cancelled
    via two chain lengths (§25: >=192-step spans; here the body is one
    attention read, so iters is per-chain)."""

    def runner(n):
        @jax.jit
        def run(x):
            def f(carry, _):
                return body(carry), None
            y, _ = jax.lax.scan(f, x, None, length=n)
            return y
        return run

    r1, r2 = runner(iters), runner(3 * iters)
    r1(x0).block_until_ready(); r2(x0).block_until_ready()   # compile
    ts = []
    for _ in range(5):
        t0 = time.perf_counter(); r1(x0).block_until_ready()
        t1 = time.perf_counter(); r2(x0).block_until_ready()
        t2 = time.perf_counter()
        ts.append(((t2 - t1) - (t1 - t0)) / (2 * iters))
    return float(np.median(ts))


def make_forms(B, H, S, D, dtype):
    """Each form: (name, body(q)->q') over a persistent K/V closure."""
    from whisper_tpu.models.whisper import _att_cross_q8, quantize_kv

    rng = np.random.RandomState(0)
    k = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    v = jnp.asarray(rng.randn(B, H, S, D), jnp.float32)
    k8, ks = quantize_kv(k)
    v8, vs = quantize_kv(v)
    kb, vb = k.astype(dtype), v.astype(dtype)
    cross_l = {"k": k8, "k_s": ks, "v": v8, "v_s": vs}
    f32 = jnp.float32
    scale = D ** -0.5

    def bf16_t8(t8):
        def body(q):
            if t8 > 1:
                qq = jnp.broadcast_to(q, (B, t8, H, D))
                s = jnp.einsum("bthd,bhsd->bhts", qq, kb,
                               preferred_element_type=f32)[:, :, :1]
            else:
                s = jnp.einsum("bthd,bhsd->bhts", q, kb,
                               preferred_element_type=f32)
            p = jax.nn.softmax(s * scale, axis=-1).astype(dtype)
            if t8 > 1:
                pp = jnp.broadcast_to(p, p.shape[:2] + (t8, p.shape[-1]))
                o = jnp.einsum("bhts,bhsd->bthd", pp, vb,
                               preferred_element_type=f32)[:, :1]
            else:
                o = jnp.einsum("bhts,bhsd->bthd", p, vb,
                               preferred_element_type=f32)
            # feed output back as next q (un-CSE-able chain carry)
            return (q + o.astype(dtype) * 1e-6).astype(dtype)
        return body

    def cq_t8(t8):
        def body(q):
            o = _att_cross_q8(q, cross_l, D, dtype, mxu_t=t8)
            return (q + o.astype(dtype) * 1e-6).astype(dtype)
        return body

    def cq_split(t8):
        """Score dot tiled (MXU), pv dot UNTILED: isolates which of the
        two broadcast dots carries the 768 regression."""
        kss = ks[:, :, None, :, 0]
        vss = vs[:, :, None, :, 0]

        def body(q):
            qq = jnp.broadcast_to(q, (B, t8, H, D))
            s = jnp.einsum("bthd,bhsd->bhts", qq, k8.astype(dtype),
                           preferred_element_type=f32)[:, :, :1]
            s = s * (kss * scale)
            p = jax.nn.softmax(s, axis=-1)
            pv = (p * vss).astype(dtype)
            o = jnp.einsum("bhts,bhsd->bthd", pv, v8.astype(dtype),
                           preferred_element_type=f32)
            return (q + o.astype(dtype) * 1e-6).astype(dtype)
        return body

    return [
        ("bf16_t0", bf16_t8(0)), ("bf16_t8", bf16_t8(8)),
        ("cq_t0", cq_t8(0)), ("cq_t4", cq_t8(4)), ("cq_t8", cq_t8(8)),
        ("cq_t16", cq_t8(16)), ("cq_split8", cq_split(8)),
    ]


def run_isolated(args) -> None:
    from whisper_tpu.config import get_config
    dtype = jnp.bfloat16
    for model in args.models.split(","):
        cfg = get_config(model)
        B, H, D = args.batch, cfg.n_heads, cfg.d_model // cfg.n_heads
        S = cfg.n_audio_ctx
        q0 = jnp.asarray(np.random.RandomState(1).randn(B, 1, H, D),
                         dtype)
        for name, body in make_forms(B, H, S, D, dtype):
            us = chain_time(body, q0, args.iters) * 1e6
            print(json.dumps({"model": model, "d_model": cfg.d_model,
                              "H": H, "batch": B, "form": name,
                              "us_per_read": round(us, 1)}), flush=True)


def run_hlo(args) -> None:
    from whisper_tpu.config import get_config
    from whisper_tpu.models.whisper import (
        decoder_step_ip, init_kv_cache, init_params, precompute_cross_kv)
    from whisper_tpu.weights import to_device

    os.makedirs("/tmp/cq768_hlo", exist_ok=True)
    for model in args.models.split(","):
        for cq in (False, True):
            cfg = get_config(model).replace(
                compute_dtype="bfloat16", cross_kv_quant=cq)
            params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                               jnp.bfloat16)
            B = args.batch
            enc = jnp.zeros((B, cfg.n_audio_ctx, cfg.d_model),
                            jnp.bfloat16)
            cross = precompute_cross_kv(params, cfg, enc)
            cache = init_kv_cache(cfg, B, dtype=jnp.bfloat16, s_max=128)
            tok = jnp.zeros((B, 1), jnp.int32)

            def step(p_, t_, c_, x_):
                return decoder_step_ip(p_, cfg, t_, jnp.int32(8), c_, x_)

            lowered = jax.jit(step).lower(params, tok, cache, cross)
            comp = lowered.compile()
            txt = comp.as_text()
            path = f"/tmp/cq768_hlo/{model}_cq{int(cq)}.hlo"
            with open(path, "w") as f:
                f.write(txt)
            fusions = txt.count(" fusion(")
            convs = txt.count("convert(")
            cycles = None
            for line in txt.splitlines():
                if "estimated_cycles" in line:
                    import re
                    m = re.search(r'"estimated_cycles":(\d+)', line)
                    if m:
                        cycles = (cycles or 0) + int(m.group(1))
            print(json.dumps({"model": model, "cq": cq, "hlo": path,
                              "fusions": fusions, "converts": convs,
                              "estimated_cycles_sum": cycles}), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--iters", type=int, default=96)
    p.add_argument("--models", default="base,small,medium")
    p.add_argument("--hlo", action="store_true")
    args = p.parse_args()
    if args.hlo:
        run_hlo(args)
    else:
        run_isolated(args)


if __name__ == "__main__":
    main()
