"""Multi-head attention: backend dispatch + XLA reference implementation.

Three backends, one semantic contract:
  * "reference" — plain-XLA einsum formulation below; ground truth for the
    Pallas kernels' parity tests and the fallback on non-TPU backends (the
    8-device virtual CPU test mesh).
  * "pallas" — flash_attention.py (prefill/encoder) and
    decode_attention.py (q_len==1) Mosaic kernels.
  * "pallas_interpret" — same kernels in interpreter mode (CPU-runnable
    kernel debugging/testing, the repo's TPU-emulation answer per
    SURVEY.md §4).

This replaces the reference's two attention kernels: the prefill/encoder
path (reference layers.mojo:273-342) and the q_len==1 register-cached decode
path (reference layers.mojo:186-272) — including its head-dispatch heuristic
(serial head loop at q_len==1, parallel otherwise, layers.mojo:344-348),
which here becomes kernel selection on T.

Layout contract (everywhere in this framework):
  q: (B, T, H, D) — token-major (straight out of the q projection);
  k, v: (B, H, S, D) — head-major (the KV-cache layout: per-head rows are
  contiguous, which is what both the flash kernel's k-tile DMA and the
  decode kernel's manual HBM streaming want).

Masking is expressed as (kv_len, causal, q_offset) — the same
cache-relative-index semantics the reference encodes in its compare at
layers.mojo:213,311-317 — never as a materialized (T, S) boolean array, so
kernels can *skip* masked blocks instead of computing-then-discarding them.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def default_backend() -> str:
    """'auto' (size-based per-call choice) on real TPU, 'reference'
    elsewhere; override with
    WHISPER_TPU_ATTN=reference|pallas|pallas_interpret|auto."""
    env = os.environ.get("WHISPER_TPU_ATTN")
    if env:
        return env
    return "auto" if jax.default_backend() == "tpu" else "reference"


# Auto-policy thresholds, from A/B benchmarks on TPU v5e (see
# benchmarks/decode_kernels_ab.py and DESIGN.md §9): measured in
# ISOLATION the VPU-vectorized batched-heads decode kernel beats XLA at
# the Whisper self-attn shape (S=448: 12.4 vs 19.3 µs at b8, bf16), but
# measured END-TO-END inside the jitted decode loop the all-XLA step
# still wins (b8 tiny bf16: 2080 vs 1836 RTFx) — a pallas_call is a
# fusion boundary, and XLA's freedom to fuse the attention into the
# surrounding projections is worth more than the kernel's standalone
# edge. So at Whisper cache sizes decode stays on XLA; the kernel
# engages where its valid-prefix streaming binds (>=4096-slot caches,
# where XLA must read the whole padded cache). Prefill/encoder uses the
# flash kernel whenever the materialized score matrix is HBM-resident:
# measured on v5e, flash wins 3.0× at the tiny encoder shape b8 (score
# bytes 432 MB: 15.96 → 5.26 ms, benchmarks/phases.py r2) and 1.5× at
# the large-v3-turbo encoder shape (r1). Below ~16 MB the scores live in
# cache-adjacent fusions and XLA's single-pass softmax fusion wins (the
# 4-token decoder prefill: 1.4 MB).
_DECODE_PALLAS_MIN_S = 4096          # long caches: streaming wins
_FLASH_MIN_SCORE_BYTES = 16 << 20    # B*H*T*S*4 (fp32 scores in HBM)


def _auto_backend(q: jax.Array, k: jax.Array) -> str:
    B, T, H, _ = q.shape
    S = k.shape[2]
    if T == 1:
        return "pallas" if S >= _DECODE_PALLAS_MIN_S else "reference"
    return ("pallas" if B * H * T * S * 4 >= _FLASH_MIN_SCORE_BYTES
            else "reference")


def multi_head_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                         kv_len=None, *,
                         causal: bool = False, q_offset=0,
                         backend: Optional[str] = None) -> jax.Array:
    """Scaled dot-product attention with backend dispatch.

    Args:
      q: (B, T, H, D).
      k, v: (B, H, S, D) head-major.
      kv_len: scalar int32 — valid keys (None = all S).
      causal: mask key_pos > q_offset + query_index.
      q_offset: absolute position of q[:, 0] (scalar).
      backend: None = auto (default_backend()).
    Returns:
      (B, T, H, D) in q.dtype.
    """
    backend = backend or default_backend()
    ragged = (kv_len is not None and jnp.ndim(kv_len) >= 1) or \
        jnp.ndim(q_offset) >= 1
    if ragged:
        backend = "reference"     # per-row lengths: XLA mask formulation
    elif backend == "auto":
        backend = _auto_backend(q, k)
    if backend == "reference":
        return mha_reference(q, k, v, kv_len, causal=causal,
                             q_offset=q_offset)
    if backend not in ("pallas", "pallas_interpret"):
        raise ValueError(f"unknown attention backend {backend!r}")
    interpret = backend == "pallas_interpret"
    T = q.shape[1]
    if T == 1:
        # q_len==1: the causal mask degenerates to the length mask
        # (kv_len == q_offset + 1), so one kernel serves self- and cross-attn.
        # The batched-heads grid is the production variant (n_heads x fewer
        # kernel programs; measured 168 vs 256+ us/call for the per-head
        # grid at b8).
        from whisper_tpu.ops.decode_attention import decode_attention_bh
        return decode_attention_bh(q, k, v, kv_len, interpret=interpret)
    from whisper_tpu.ops.flash_attention import flash_attention
    return flash_attention(q, k, v, kv_len, q_offset, causal=causal,
                           interpret=interpret)


def multi_head_attention_quant(q: jax.Array,
                               k: jax.Array, k_scale: jax.Array,
                               v: jax.Array, v_scale: jax.Array,
                               kv_len=None, *,
                               causal: bool = False, q_offset=0,
                               backend: Optional[str] = None) -> jax.Array:
    """Attention over an int8 KV cache (values + per-vector fp32 scales).

    On TPU the q_len==1 path uses the fused Pallas kernel that dequantizes
    in VMEM after the half-bandwidth int8 transfer; everywhere else (CPU,
    prefill) the cache is dequantized and routed through the standard
    dispatch — XLA materializes the fp32 cache there, which is why the
    kernel exists."""
    backend = backend or default_backend()
    T = q.shape[1]
    S = k.shape[2]
    ragged = (kv_len is not None and jnp.ndim(kv_len) >= 1) or \
        jnp.ndim(q_offset) >= 1
    # The fused kernel is gated on cache length like the fp32 kernel: per-
    # (batch, head) program overhead swamps the bandwidth saving at Whisper
    # cache sizes (measured: b32 tiny regresses 4371 -> 667 RTFx when
    # forced). Below the threshold int8 remains a memory-capacity feature
    # via the dequantize-then-XLA route.
    use_kernel = (T == 1 and not ragged
                  and (backend == "pallas_interpret"
                       or (backend in ("auto", "pallas")
                           and S >= _DECODE_PALLAS_MIN_S
                           and jax.default_backend() == "tpu")))
    if use_kernel:
        from whisper_tpu.ops.decode_attention import decode_attention_q8_bh
        return decode_attention_q8_bh(
            q, k, k_scale, v, v_scale, kv_len,
            interpret=backend == "pallas_interpret")
    kd = (k.astype(jnp.float32) * k_scale).astype(q.dtype)
    vd = (v.astype(jnp.float32) * v_scale).astype(q.dtype)
    return multi_head_attention(q, kd, vd, kv_len, causal=causal,
                                q_offset=q_offset, backend=backend)


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  kv_len=None, *, causal: bool = False, q_offset=0,
                  precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """XLA reference attention (semantic ground truth).

    Same signature semantics as multi_head_attention; additionally kv_len
    and q_offset may be per-batch (B,) arrays (ragged lengths — the
    continuous-batching decode path). Scaling matches the reference:
    q * head_dim**-0.5 before the score matmul (reference layers.mojo:184:
    scale = 1/sqrt(64))."""
    B, T, H, D = q.shape
    S = k.shape[2]
    qf = q.astype(jnp.float32) * (D ** -0.5)
    scores = jnp.einsum("bthd,bhsd->bhts", qf, k.astype(jnp.float32),
                        precision=precision)

    def per_batch(x):
        """scalar -> (1, 1, 1); (B,) -> (B, 1, 1); broadcast over (T, S)."""
        a = jnp.asarray(x)
        return a.reshape(-1, 1, 1) if a.ndim == 1 else a.reshape(1, 1, 1)

    key_idx = jnp.arange(S)[None, None, :]               # (1, 1, S)
    mask = None
    if kv_len is not None:
        mask = key_idx < per_batch(kv_len)               # (B?, 1, S)
    if causal:
        q_idx = per_batch(q_offset) + jnp.arange(T)[None, :, None]
        c = key_idx <= q_idx                             # (B?, T, S)
        mask = c if mask is None else jnp.logical_and(mask, c)
    if mask is not None:
        scores = jnp.where(mask[:, None], scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bhsd->bthd", probs, v.astype(jnp.float32),
                     precision=precision)
    return out.astype(q.dtype)
