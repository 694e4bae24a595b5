"""Flash attention (Pallas/TPU) for encoder and prefill paths.

TPU-native replacement for the reference's prefill/encoder attention kernel
(reference layers.mojo:273-342: per-head score matmul via MAX Engine,
scale+mask, softmax over the materialized (1500,1500) scores, weighted-V).
Here the scores tile lives only in VMEM and is consumed immediately by the
online-softmax update — the (S, S) matrix never touches HBM, which removes
the dominant HBM traffic of the encoder layers (6 heads x 1500^2 fp32 scores
per layer in the reference's formulation).

Kernel shape: grid (B, H, T_blocks); each program holds one q tile in VMEM
and loops over k/v tiles with `lax.fori_loop` carrying (m, l, acc) running
statistics. The kv loop bound is *dynamic* — `cdiv(kv_len, block_k)`, further
clipped under causal masking to the diagonal — so masked-out tail blocks of a
padded cache are never read or computed (the grid-level analogue of the
reference's cache-relative masking, layers.mojo:311-317).

Masking semantics (one kernel serves three call sites):
  * encoder self-attn: causal=False, kv_len=S            (all keys valid)
  * decoder prefill self-attn over the padded KV cache:
      causal=True, q_offset=pos0, kv_len=pos0+T
  * cross-attn: causal=False, kv_len=S_audio
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# -0.7 * f32max, not -inf: avoids NaN from exp(-inf - (-inf)) in fully
# masked tiles.
_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _flash_kernel(info_ref, q_ref, k_ref, v_ref, o_ref, *,
                  block_k: int, causal: bool, scale: float, prec):
    """One (batch, head, q-tile) program.

    info_ref: SMEM (2,) int32 = [kv_len, q_offset] (scalar-prefetched).
    q_ref:    VMEM (1, 1, block_q, D) — this program's query tile.
    k_ref/v_ref: VMEM (1, 1, S_pad, D) — full K/V for this (b, h).
    o_ref:    VMEM (1, 1, block_q, D).
    """
    kv_len = info_ref[0]
    q_off = info_ref[1]
    q = q_ref[0, 0].astype(jnp.float32) * scale          # (bq, D)
    block_q, d = q.shape
    iq = pl.program_id(2)

    q_pos = (q_off + iq * block_q
             + jax.lax.broadcasted_iota(jnp.int32, (block_q, 1), 0))

    num_k = pl.cdiv(kv_len, block_k)
    if causal:
        # last k block intersecting the diagonal of this q tile
        max_q_pos = q_off + (iq + 1) * block_q - 1
        num_k = jnp.minimum(num_k, max_q_pos // block_k + 1)

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, 0, pl.ds(j * block_k, block_k), :]
        vb = v_ref[0, 0, pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, kb.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)  # (bq, bk)
        k_pos = (j * block_k
                 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1))
        mask = k_pos < kv_len
        if causal:
            mask = jnp.logical_and(mask, k_pos <= q_pos)
        s = jnp.where(mask, s, _MASK_VALUE)

        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(vb.dtype), vb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        acc_new = acc * alpha + pv
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), _MASK_VALUE, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc0 = jnp.zeros((block_q, d), jnp.float32)
    _, l, acc = jax.lax.fori_loop(0, num_k, body, (m0, l0, acc0))

    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0, 0] = out.astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _env_block(name: str, default: int) -> int:
    """A/B knob, read at TRACE time: the jit cache keys on the (None) block
    args, so changing the env var mid-process does not retrigger a trace —
    set it before the first call (benchmarks run one setting per process)."""
    import os
    return int(os.environ.get(name, default))


@functools.partial(
    jax.jit,
    static_argnames=("causal", "block_q", "block_k", "interpret"))
def flash_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                    kv_len=None, q_offset=None, *,
                    causal: bool = False,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False) -> jax.Array:
    """softmax(q k^T / sqrt(D)) v with online softmax, never materializing
    the score matrix.

    Args:
      q: (B, T, H, D).
      k, v: (B, H, S, D) — head-major layout (the KV-cache layout).
      kv_len: scalar int32 — number of valid keys (default S). Blocks past
        kv_len are neither read nor computed.
      q_offset: scalar int32 — absolute position of q[:, 0] for causal
        masking (default 0).
      causal: static — apply key_pos <= query_pos masking.
    Returns:
      (B, T, H, D) in q.dtype.
    """
    B, T, H, D = q.shape
    S = k.shape[2]
    if kv_len is None:
        kv_len = S
    if q_offset is None:
        q_offset = 0
    scale = D ** -0.5
    # Block defaults (v5e, tuned r2): BIG tiles — the per-program compute
    # at Whisper sizes is ~0.1-1 GFLOP, so the sequential Pallas grid's
    # per-program overhead dominates with small tiles (256/512 blocks ran
    # the tiny encoder layer at 689 us; 1536/1536 measured 510). The
    # fp32 score tile is block_q x block_k x 4 B of VMEM, so block_q is
    # capped at 768 (4.5 MB scores; 1536x1536's ~17 MB tripped the 16 MB
    # scoped default at b32). Env knobs WHISPER_TPU_FLASH_BQ/BK for A/B.
    if block_q is None:
        block_q = _env_block("WHISPER_TPU_FLASH_BQ", 768)
    if block_k is None:
        block_k = _env_block("WHISPER_TPU_FLASH_BK", 1536)

    # unify dtypes: mixed fp32-q/bf16-kv fails Mosaic's dot lowering
    # ("Bad lhs type"), and mixed inputs are never intentional here
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)

    qt = jnp.transpose(q, (0, 2, 1, 3))                  # (B, H, T, D)
    # sublane-align small prefills (16 covers bf16's (16, 128) min tile);
    # never let a block exceed the (rounded) actual extent
    block_q = min(block_q, _round_up(T, 16))
    block_k = min(block_k, _round_up(S, 128))
    t_pad = _round_up(T, block_q)
    s_pad = _round_up(S, block_k)
    if t_pad != T:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))

    info = jnp.stack([jnp.asarray(kv_len, jnp.int32).reshape(()),
                      jnp.asarray(q_offset, jnp.int32).reshape(())])

    # fp32 inputs get true-fp32 MXU passes (the token-parity contract);
    # bf16 inputs take the fast single-pass path.
    prec = (jax.lax.Precision.HIGHEST if q.dtype == jnp.float32 else None)

    grid = (B, H, t_pad // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, causal=causal,
                          scale=scale, prec=prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, block_q, D),
                             lambda b, h, t, *_: (b, h, t, 0)),
                pl.BlockSpec((1, 1, s_pad, D),
                             lambda b, h, t, *_: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, s_pad, D),
                             lambda b, h, t, *_: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, block_q, D),
                                   lambda b, h, t, *_: (b, h, t, 0)),
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, t_pad, D), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
            # headroom over the 16 MB scoped default for big env-override
            # blocks (score tile = block_q x block_k x 4 B)
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * H * T * S * D,
            bytes_accessed=(B * H * (T + 2 * S) * D * q.dtype.itemsize
                            + B * H * T * D * q.dtype.itemsize),
            transcendentals=B * H * T * S,
        ),
        interpret=interpret,
    )(info, qt, k, v)

    return jnp.transpose(out[:, :, :T, :], (0, 2, 1, 3))
