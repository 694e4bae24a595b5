"""Incremental-decode attention (Pallas/TPU): one query token against a
padded KV cache, transferring only the valid prefix from HBM.

Three kernels live here:
  * decode_attention_bh — the production variant: grid (B, kv_tiles), ALL
    heads per program (static unroll). Measured on v5e at Whisper-Tiny
    shapes (bf16, kv_len 93): 168 us/call vs ~260+ for the per-(b, h) grid;
    XLA's batched attention still edges both (155 us) below the dispatch
    thresholds in ops/attention.py, so this engages at >=4096-slot caches.
  * decode_attention — the original per-(b, h) grid, kept as the simplest
    reference formulation and for A/B tests.
  * decode_attention_q8 — int8 cache + per-vector scales, dequantized in
    VMEM after the half-bandwidth transfer.

TPU-native replacement for the reference's q_len==1 register-cached decode
path (reference layers.mojo:186-272: per head, hoist the 64-dim query into
SIMD registers, scalar-loop scores over cached keys, inline softmax,
register-accumulated weighted-V). The reference's trick is keeping q in
registers and streaming K/V from memory exactly once; the TPU analogue here
keeps q, the online-softmax statistics, and the output accumulator in VMEM
scratch while K/V tiles stream through the Pallas pipeline.

The cache is padded to S_max (448 decoder positions) but typically only
~kv_len ~ 100 slots are valid. Blocks past the valid length are *neither
computed nor transferred*: the grid's KV dimension walks all S_max/block_k
tiles, but the BlockSpec index map — which receives the scalar-prefetched
kv_len — clamps out-of-range tile indices to the last valid tile, and
Pallas elides the DMA when consecutive grid steps map to the same tile. Net
HBM traffic is ceil(kv_len/block_k) tiles, the minimum possible. Compute for
dead tiles is skipped with pl.when.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _decode_kernel(info_ref, q_ref, k_ref, v_ref, o_ref,
                   m_s, l_s, acc_s, *, block_k: int, scale: float, prec):
    """One (batch, head, kv-tile) step (see also _decode_kernel_q8).

    info_ref: SMEM (1,) int32 = [kv_len] (scalar-prefetched).
    q_ref: VMEM (1, 1, 1, D) — this (b, h)'s query row (same tile for all j).
    k_ref/v_ref: VMEM (1, 1, block_k, D) — the j-th (clamped) cache tile.
    o_ref: VMEM (1, 1, 1, D).
    m_s/l_s: VMEM (1, 1) fp32; acc_s: VMEM (1, D) fp32 — persist across j.
    """
    j = pl.program_id(2)
    kv_len = info_ref[0]

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _MASK_VALUE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(j * block_k < kv_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale      # (1, D)
        kb = k_ref[0, 0]                                 # (block_k, D)
        s = jax.lax.dot_general(
            q, kb.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (1, block_k)
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        s = jnp.where(k_pos < kv_len, s, _MASK_VALUE)

        m_prev, l_prev = m_s[...], l_s[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_s[...] = m_new
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[0, 0]
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (1, D)
        acc_s[...] = acc_s[...] * alpha + pv

    # Constant output tile index across j => the store is flushed once per
    # (b, h); writing every step avoids a branch.
    o_ref[0, 0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


def _decode_kernel_q8(info_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref,
                      m_s, l_s, acc_s, *, block_k: int, scale: float):
    """int8-cache variant: K/V tiles arrive as int8 + per-row fp32 scales
    and are dequantized IN VMEM after the (half-sized) HBM transfer — the
    bandwidth saving the XLA formulation can't get (it materializes the
    dequantized cache in HBM first). The quantized-paged-attention recipe
    from the TPU kernel playbook, minus paging."""
    j = pl.program_id(2)
    kv_len = info_ref[0]

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _MASK_VALUE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(j * block_k < kv_len)
    def _():
        q = q_ref[0, 0].astype(jnp.float32) * scale      # (1, D)
        kb = k_ref[0, 0].astype(jnp.float32) * ks_ref[0, 0]   # (bk, D)
        s = jax.lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (1, block_k)
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        s = jnp.where(k_pos < kv_len, s, _MASK_VALUE)

        m_prev, l_prev = m_s[...], l_s[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_s[...] = m_new
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        vb = v_ref[0, 0].astype(jnp.float32) * vs_ref[0, 0]
        pv = jax.lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)          # (1, D)
        acc_s[...] = acc_s[...] * alpha + pv

    o_ref[0, 0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _decode_kernel_bg(info_ref, q_ref, k_ref, v_ref, o_ref,
                      m_s, l_s, acc_s, *, block_k: int, scale: float):
    """Batch-grouped variant: one program per (batch-GROUP, kv-tile)
    computes `bg` batch rows x all heads. Exists because the (B, tiles)
    grid pays its fixed per-grid-step cost B x tiles times — measured
    e2e-fatal at b32 (7.4 ms/step through the full dispatch, DESIGN.md
    §20); grouping divides the step count by bg while keeping the VPU
    mult-reduce formulation of _decode_kernel_bh.

    q_ref: (bg, H, D); k_ref/v_ref: (bg, H, block_k, D); o_ref: (bg, H, D).
    Scratch m_s/l_s: (bg, H, 1); acc_s: (bg, H, D)."""
    j = pl.program_id(1)
    kv_len = info_ref[0]

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _MASK_VALUE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(j * block_k < kv_len)
    def _():
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_k), 2))
        valid = k_pos < kv_len                           # (1, 1, bk)
        qa = q_ref[...].astype(jnp.float32) * scale      # (bg, H, D)
        ka = k_ref[...].astype(jnp.float32)              # (bg, H, bk, D)
        va = v_ref[...].astype(jnp.float32)
        s = jnp.sum(qa[:, :, None, :] * ka, axis=-1)     # (bg, H, bk)
        s = jnp.where(valid, s, _MASK_VALUE)
        m_prev, l_prev = m_s[...], l_s[...]              # (bg, H, 1)
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_s[...] = m_new
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[...] = (acc_s[...] * alpha
                      + jnp.sum(p[..., None] * va, axis=2))  # (bg, H, D)

    @pl.when(j == pl.num_programs(1) - 1)
    def _():
        o_ref[...] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)
                      ).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("block_k", "block_b", "interpret"))
def decode_attention_bg(q: jax.Array, k: jax.Array, v: jax.Array,
                        kv_len=None, *, block_k: int = 128,
                        block_b: int = 8,
                        interpret: bool = False) -> jax.Array:
    """decode_attention over a (B/block_b, S_tiles) grid — block_b batch
    rows x all heads per program. Same valid-prefix tile clamping as
    decode_attention_bh (only ceil(kv_len/block_k) tiles move per group).

    The decode-loop variant for LARGE batch: at b32 the (B, tiles) grid's
    384 grid steps/call drown the 36.9 MB/layer cross read in per-step
    overhead; (B/8, tiles) is 48. VMEM per step: 2 x block_b x H x
    block_k x D x 2B (in, double-buffered) + fp32 score intermediate."""
    B, T, H, D = q.shape
    assert T == 1 and B % block_b == 0
    S = k.shape[2]
    if kv_len is None:
        kv_len = S
    scale = D ** -0.5
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)

    s_pad = _round_up(S, block_k)
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    num_kv_tiles = s_pad // block_k

    q3 = q[:, 0]                                     # (B, H, D)
    info = jnp.asarray(kv_len, jnp.int32).reshape(1)

    def kv_index(g, j, info_ref):
        last = jnp.maximum(pl.cdiv(info_ref[0], block_k) - 1, 0)
        return (g, 0, jnp.minimum(j, last), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel_bg, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B // block_b, num_kv_tiles),
            in_specs=[
                pl.BlockSpec((block_b, H, D), lambda g, j, *_: (g, 0, 0)),
                pl.BlockSpec((block_b, H, block_k, D), kv_index),
                pl.BlockSpec((block_b, H, block_k, D), kv_index),
            ],
            out_specs=pl.BlockSpec((block_b, H, D),
                                   lambda g, j, *_: (g, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_b, H, 1), jnp.float32),
                pltpu.VMEM((block_b, H, 1), jnp.float32),
                pltpu.VMEM((block_b, H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(info, q3, k, v)

    return out[:, None]                              # (B, 1, H, D)


def _decode_kernel_bh(info_ref, q_ref, k_ref, v_ref, o_ref,
                      m_s, l_s, acc_s, *, block_k: int, scale: float,
                      n_heads: int, prec):
    """Batched-heads variant: one program per (batch, kv-tile) computes ALL
    heads — n_heads x fewer kernel programs than the per-(b, h) grid, the
    dispatch-overhead fix suggested by measurement (DESIGN.md §5).

    The whole online-softmax update is vectorized across heads on the VPU:
    scores are a broadcast multiply-reduce (q (H,1,D) * k (H,bk,D) summed
    over D) rather than H tiny (1,D)x(D,bk) MXU matvecs — at q_len==1 the
    MXU runs at 1/128 row occupancy, so the VPU formulation is both faster
    and layout-friendlier (the per-head loop's (H,D)->(1,H,1,D) store
    reshape is rejected by current Mosaic for bf16).

    q_ref: (1, H, D); k_ref/v_ref: (1, H, block_k, D); o_ref: (1, H, D).
    Scratch m_s/l_s: (H, 1); acc_s: (H, D). prec kept for signature parity.
    """
    del prec
    j = pl.program_id(1)
    kv_len = info_ref[0]

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _MASK_VALUE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(j * block_k < kv_len)
    def _():
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        valid = k_pos < kv_len                               # (1, bk)
        qa = q_ref[0].astype(jnp.float32) * scale            # (H, D)
        ka = k_ref[0].astype(jnp.float32)                    # (H, bk, D)
        va = v_ref[0].astype(jnp.float32)
        s = jnp.sum(qa[:, None, :] * ka, axis=-1)            # (H, bk)
        s = jnp.where(valid, s, _MASK_VALUE)
        m_prev, l_prev = m_s[...], l_s[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_s[...] = m_new
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[...] = (acc_s[...] * alpha
                      + jnp.sum(p[:, :, None] * va, axis=1))  # (H, D)

    o_ref[0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def decode_attention_bh(q: jax.Array, k: jax.Array, v: jax.Array,
                        kv_len=None, *, block_k: int = 128,
                        interpret: bool = False) -> jax.Array:
    """decode_attention with the batched-heads grid: (B, S_tiles) programs
    instead of (B, H, S_tiles). Same semantics and masking."""
    B, T, H, D = q.shape
    assert T == 1
    S = k.shape[2]
    if kv_len is None:
        kv_len = S
    scale = D ** -0.5
    k = k.astype(q.dtype)        # mixed dtypes fail Mosaic dot lowering
    v = v.astype(q.dtype)

    s_pad = _round_up(S, block_k)
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    num_kv_tiles = s_pad // block_k

    q3 = q[:, 0]                                     # (B, H, D)
    info = jnp.asarray(kv_len, jnp.int32).reshape(1)
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)

    def kv_index(b, j, info_ref):
        last = jnp.maximum(pl.cdiv(info_ref[0], block_k) - 1, 0)
        return (b, 0, jnp.minimum(j, last), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel_bh, block_k=block_k, scale=scale,
                          n_heads=H, prec=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, num_kv_tiles),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, j, *_: (b, 0, 0)),
                pl.BlockSpec((1, H, block_k, D), kv_index),
                pl.BlockSpec((1, H, block_k, D), kv_index),
            ],
            out_specs=pl.BlockSpec((1, H, D),
                                   lambda b, j, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(info, q3, k, v)

    return out[:, None]                              # (B, 1, H, D)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def decode_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     kv_len=None, *, block_k: int = 128,
                     interpret: bool = False) -> jax.Array:
    """Single-token attention over a (possibly padded) KV cache.

    Args:
      q: (B, 1, H, D) — the new token's query.
      k, v: (B, H, S_max, D) — cache in head-major layout.
      kv_len: scalar int32 — valid cache length (default S_max). Only
        ceil(kv_len/block_k) tiles are transferred or computed.
    Returns:
      (B, 1, H, D) in q.dtype.
    """
    B, T, H, D = q.shape
    assert T == 1, f"decode_attention is the q_len==1 path, got T={T}"
    S = k.shape[2]
    if kv_len is None:
        kv_len = S
    scale = D ** -0.5

    s_pad = _round_up(S, block_k)
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
    num_kv_tiles = s_pad // block_k

    # (B, H, 1, D): trailing (1, D) block dims equal the array dims,
    # satisfying Mosaic's last-two-dims tiling rule for any H and D=64.
    q4 = jnp.transpose(q, (0, 2, 1, 3))
    info = jnp.asarray(kv_len, jnp.int32).reshape(1)

    def kv_index(b, h, j, info_ref):
        # Clamp dead tiles to the last valid tile: Pallas skips the DMA when
        # the mapped index doesn't change between steps.
        last = jnp.maximum(pl.cdiv(info_ref[0], block_k) - 1, 0)
        return (b, h, jnp.minimum(j, last), 0)

    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, block_k=block_k, scale=scale,
                          prec=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, num_kv_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, D), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, D),
                                   lambda b, h, j, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, 1), jnp.float32),
                pltpu.VMEM((1, 1), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * H * S * D * k.dtype.itemsize,
            transcendentals=B * H * S,
        ),
        interpret=interpret,
    )(info, q4, k, v)

    return jnp.transpose(out, (0, 2, 1, 3))              # (B, 1, H, D)


def _decode_kernel_q8_bh(info_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
                         o_ref, m_s, l_s, acc_s, *, block_k: int,
                         scale: float, n_heads: int):
    """Batched-heads int8 variant: grid (B, kv_tiles), all heads per
    program, int8 tiles + per-vector scales dequantized in VMEM. Same
    vectorized-across-heads VPU formulation as _decode_kernel_bh."""
    del n_heads
    j = pl.program_id(1)
    kv_len = info_ref[0]

    @pl.when(j == 0)
    def _():
        m_s[...] = jnp.full_like(m_s, _MASK_VALUE)
        l_s[...] = jnp.zeros_like(l_s)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(j * block_k < kv_len)
    def _():
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        valid = k_pos < kv_len                               # (1, bk)
        qa = q_ref[0].astype(jnp.float32) * scale            # (H, D)
        ka = k_ref[0].astype(jnp.float32) * ks_ref[0]        # (H, bk, D)
        va = v_ref[0].astype(jnp.float32) * vs_ref[0]
        s = jnp.sum(qa[:, None, :] * ka, axis=-1)            # (H, bk)
        s = jnp.where(valid, s, _MASK_VALUE)
        m_prev, l_prev = m_s[...], l_s[...]
        m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        m_s[...] = m_new
        l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_s[...] = (acc_s[...] * alpha
                      + jnp.sum(p[:, :, None] * va, axis=1))

    o_ref[0] = (acc_s[...] / jnp.maximum(l_s[...], 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def decode_attention_q8_bh(q: jax.Array,
                           k: jax.Array, k_scale: jax.Array,
                           v: jax.Array, v_scale: jax.Array,
                           kv_len=None, *, block_k: int = 128,
                           interpret: bool = False) -> jax.Array:
    """decode_attention_q8 with the batched-heads grid (the production
    int8 variant; see _decode_kernel_q8_bh)."""
    B, T, H, D = q.shape
    assert T == 1
    S = k.shape[2]
    if kv_len is None:
        kv_len = S
    scale = D ** -0.5

    s_pad = _round_up(S, block_k)
    if s_pad != S:
        pad4 = ((0, 0), (0, 0), (0, s_pad - S), (0, 0))
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        k_scale = jnp.pad(k_scale, pad4)
        v_scale = jnp.pad(v_scale, pad4)
    num_kv_tiles = s_pad // block_k

    q3 = q[:, 0]                                     # (B, H, D)
    info = jnp.asarray(kv_len, jnp.int32).reshape(1)

    def kv_index(b, j, info_ref):
        last = jnp.maximum(pl.cdiv(info_ref[0], block_k) - 1, 0)
        return (b, 0, jnp.minimum(j, last), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8_bh, block_k=block_k, scale=scale,
                          n_heads=H),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, num_kv_tiles),
            in_specs=[
                pl.BlockSpec((1, H, D), lambda b, j, *_: (b, 0, 0)),
                pl.BlockSpec((1, H, block_k, D), kv_index),
                pl.BlockSpec((1, H, block_k, 1), kv_index),
                pl.BlockSpec((1, H, block_k, D), kv_index),
                pl.BlockSpec((1, H, block_k, 1), kv_index),
            ],
            out_specs=pl.BlockSpec((1, H, D),
                                   lambda b, j, *_: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, 1), jnp.float32),
                pltpu.VMEM((H, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(info, q3, k, k_scale, v, v_scale)

    return out[:, None]                              # (B, 1, H, D)


@functools.partial(jax.jit, static_argnames=("block_k", "interpret"))
def decode_attention_q8(q: jax.Array,
                        k: jax.Array, k_scale: jax.Array,
                        v: jax.Array, v_scale: jax.Array,
                        kv_len=None, *, block_k: int = 128,
                        interpret: bool = False) -> jax.Array:
    """Single-token attention over an int8 KV cache with per-vector scales;
    dequantization happens in VMEM after the half-bandwidth HBM transfer.

    Args:
      q: (B, 1, H, D).
      k, v: (B, H, S_max, D) int8; k_scale, v_scale: (B, H, S_max, 1) fp32.
      kv_len: scalar int32 valid length.
    Returns:
      (B, 1, H, D) in q.dtype.
    """
    B, T, H, D = q.shape
    assert T == 1
    S = k.shape[2]
    if kv_len is None:
        kv_len = S
    scale = D ** -0.5

    s_pad = _round_up(S, block_k)
    if s_pad != S:
        pad4 = ((0, 0), (0, 0), (0, s_pad - S), (0, 0))
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
        k_scale = jnp.pad(k_scale, pad4)
        v_scale = jnp.pad(v_scale, pad4)
    num_kv_tiles = s_pad // block_k

    q4 = jnp.transpose(q, (0, 2, 1, 3))
    info = jnp.asarray(kv_len, jnp.int32).reshape(1)

    def kv_index(b, h, j, info_ref):
        last = jnp.maximum(pl.cdiv(info_ref[0], block_k) - 1, 0)
        return (b, h, jnp.minimum(j, last), 0)

    out = pl.pallas_call(
        functools.partial(_decode_kernel_q8, block_k=block_k, scale=scale),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, H, num_kv_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, 1, D), lambda b, h, j, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
                pl.BlockSpec((1, 1, block_k, 1), kv_index),
                pl.BlockSpec((1, 1, block_k, D), kv_index),
                pl.BlockSpec((1, 1, block_k, 1), kv_index),
            ],
            out_specs=pl.BlockSpec((1, 1, 1, D),
                                   lambda b, h, j, *_: (b, h, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((1, 1), jnp.float32),
                pltpu.VMEM((1, 1), jnp.float32),
                pltpu.VMEM((1, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, 1, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * S * D,
            bytes_accessed=2 * B * H * S * (D + 4),
            transcendentals=B * H * S,
        ),
        interpret=interpret,
    )(info, q4, k, k_scale, v, v_scale)

    return jnp.transpose(out, (0, 2, 1, 3))
