"""Fused encoder-block tail (Pallas/TPU): attention + output projection +
residual + LayerNorm + MLP + residual in ONE kernel program per
(batch, q-block).

Why (VERDICT r2 weak #1 / next #1): the tiny-b8 encoder measured 5.3 ms of
which only ~2.2 ms is flash attention — the rest is the projections/MLP/LN
"tail" that XLA runs as separate fusions with HBM round trips between them
(attention-out, post-o hidden state, and the 4x-wide fc1 intermediate each
travel to HBM and back). This kernel keeps the whole tail VMEM-resident:
the (bq, S) score tile, the per-head attention outputs, the o-projection,
both residuals, LN2 and the (bq, ff) GeLU intermediate never touch HBM.
Per program it runs ~2.5-8 GFLOP (vs ~0.3 for a flash-only program), so the
sequential Pallas grid's per-program overhead is amortized ~10x better.

The reference hand-specializes exactly these matmuls via MAX
(reference whisper_tensor.mojo:74-146) and runs attention with materialized
per-head scores (reference layers.mojo:273-342); this kernel is the
TPU-shaped version of the same idea — fuse the block so the MXU never
waits on HBM.

Scope: the block's LN1 + fused-QKV projection stays in XLA (attention needs
ALL positions' K/V before any q-block can run, so the projection is a
sequential barrier; XLA runs it as one large matmul near roofline). The
kernel consumes q/k/v + the residual input and emits the block output.

Mosaic layout rules (same ground rules as ops/decoder_step.py, measured on
the real v5e):
  * head_dim 64 per-head slices are legal reads (block last dim == array
    dim), but CONCATENATING heads back to d lanes is a lane-dim reshape —
    unsupported. Per-head attention outputs are instead stored into a
    (bq, H*128) scratch at 128-aligned lane slots, and the o-projection
    weight rows are padded to match (zero pad rows; exact).
  * v5e VMEM is ~128 MiB; at bq=1536 the whole program (scores 9.4 MB +
    GeLU intermediate + weights) sits ~35 MB — vmem_limit_bytes raised.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from whisper_tpu.ops.decoder_step import _gelu_exact, _ln

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
_LANE = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tail_kernel(q_ref, k_ref, v_ref, h_ref, wo, fc1, fc2, misc,
                 o_ref, af_s, *,
                 H: int, D: int, d: int, ff: int, S: int, s_pad: int,
                 eps: float, dtype, prec, mlp_q: bool, o_q: bool,
                 interpret: bool):
    """One (batch, q-block) program.

    q_ref: (1, H, bq, D); k_ref/v_ref: (1, H, s_pad, D); h_ref: (1, bq, d)
    residual input; wo: (H*128, d) pad-row o-projection; fc1: (d, ff);
    fc2: (ff, d); misc: (1, P) fp32 = [o_b(d) | fc1_b(ff) | fc2_b(d) |
    ln2_g(d) | ln2_b(d)]; o_ref: (1, bq, d); af_s: (bq, H*128) fp32 scratch.

    mlp_q (DESIGN.md §32b): fc1/fc2 arrive as per-output-column int8 and
    misc carries their scale vectors ([... | fc1_s(ff) | fc2_s(d)]); the
    two MLP dots run s8 x s8 on the MXU with dynamic per-row activation
    quant computed in-register — the §32 integration costs (tail-fusion
    bypass, act-quant HBM round trips) don't apply inside the kernel.
    """
    f32 = jnp.float32
    Dp = _LANE
    scale = D ** -0.5
    m = misc[0]
    o_b, fc1_b = m[:d], m[d:d + ff]
    fc2_b = m[d + ff:2 * d + ff]
    ln_g, ln_b = m[2 * d + ff:3 * d + ff], m[3 * d + ff:4 * d + ff]
    if mlp_q:
        fc1_s = m[4 * d + ff:4 * d + 2 * ff]
        fc2_s = m[4 * d + 2 * ff:5 * d + 2 * ff]
    if o_q:                              # experiment: int8 o-projection
        wo_s = m[5 * d + 2 * ff:6 * d + 2 * ff]

    def rnd(x32):
        """Round fp32 through the compute dtype — replicates the XLA block's
        bf16 storage points (attention out, projection outputs, residuals)
        so the fused path tracks the reference block tightly."""
        return x32.astype(dtype).astype(f32)

    def dot(x, w):
        return jax.lax.dot_general(
            x.astype(dtype), w, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)

    # ---- attention, one head at a time (scores stay in VMEM) ----
    # zero the whole scratch first: per-head stores below touch only the
    # 128-aligned live lanes (odd-64-offset lane stores are Mosaic-illegal),
    # and the zero pad lanes meet wo's zero pad rows (exact)
    af_s[...] = jnp.zeros(af_s.shape, f32)
    kmask = jax.lax.broadcasted_iota(jnp.int32, (1, s_pad), 1) < S
    for hi in range(H):
        q = q_ref[0, hi].astype(f32) * scale              # (bq, D)
        kh = k_ref[0, hi]                                 # (s_pad, D)
        s = jax.lax.dot_general(
            q, kh.astype(f32), (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=prec)   # (bq, s_pad)
        s = jnp.where(kmask, s, _MASK_VALUE)
        mx = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - mx)
        l = jnp.sum(p, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, hi],
            (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)   # (bq, D)
        # 128-aligned lane slot (layout offset 0 — Mosaic-legal store)
        af_s[:, hi * Dp: hi * Dp + D] = rnd(pv / jnp.maximum(l, 1e-30))

    def qdot(x32, w_ref, w_s):
        """Dynamic per-row int8 act quant + s8 x s8 MXU dot + exact
        rescale — linear_i8dyn's math, VMEM-resident (§32b)."""
        sx = jnp.maximum(jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
                         / 127.0, 1e-10)
        xq = jnp.clip(jnp.round(x32 / sx), -127, 127).astype(jnp.int8)
        acc = jax.lax.dot_general(xq, w_ref[...], (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        return acc.astype(f32) * (sx * w_s[None, :])

    # ---- o-projection + residual ----
    h = h_ref[0].astype(f32)
    o_dot = (qdot(af_s[...], wo, wo_s) if o_q
             else dot(af_s[...], wo[...]))
    h2 = rnd(h + rnd(rnd(o_dot) + rnd(o_b[None, :])))

    # ---- LN2 + MLP + residual ----
    y = rnd(_ln(h2, ln_g, ln_b, eps))
    if mlp_q:
        t1 = rnd(rnd(qdot(y, fc1, fc1_s)) + rnd(fc1_b[None, :]))
        t1 = rnd(_gelu_exact(t1, interpret))
        t2 = rnd(rnd(qdot(t1, fc2, fc2_s)) + rnd(fc2_b[None, :]))
    else:
        t1 = rnd(rnd(dot(y, fc1[...])) + rnd(fc1_b[None, :]))
        t1 = rnd(_gelu_exact(t1, interpret))
        t2 = rnd(rnd(dot(t1, fc2[...])) + rnd(fc2_b[None, :]))
    o_ref[0] = (h2 + t2).astype(o_ref.dtype)


def _env_block(name: str, default: int) -> int:
    """A/B knob, read at TRACE time (set before the first call)."""
    return int(os.environ.get(name, default))


# Calibrated on the real v5e (bench_turbo r3): small d=768 bq=768 compiles
# (estimate ~98 MB), large-v3-turbo d=1280 bq=768 FAILS at a measured
# 157.6 MB program VMEM (73.8 MB of it register-allocator spill slots for
# the fp32 MLP intermediates), and d=1280 bq=384 (estimate 112 MB)
# COMPILES AND WINS the turbo A/B (933 vs 920 RTFx at bq=256). The
# estimator mirrors the observed Mosaic accounting: lane-padded
# double-buffered k/v windows + single-buffered weights + a 2.5x fudge on
# the fp32 transient set (scores, GeLU intermediate, residual copies) for
# spills; the budget sits just above the measured-good 112 MB point.
_VMEM_BUDGET = 113 * 1024 * 1024
# §32b int8-MLP budget (r4, all three boundary points measured): the
# int8 weights shrink the program, but the NEXT block size up fails in
# the e2e context at both widths — d=1280 bq=512 compiles standalone
# and wins the encoder A/B (722.2 vs 731.8 ms/encode) yet EXCEEDS
# scoped vmem by 492 KB inside bench's chained stage1 (112.98M vs
# 112.5M), and d=1024 bq=768 fails even standalone (101.8M vs 100M).
# So the int8-MLP budget equals the bf16 one: same blocks ship, the
# int8 savings buy headroom rather than a bigger tile. Revisit only if
# the scoped-vmem limit or the transient set changes.
_VMEM_BUDGET_I8 = _VMEM_BUDGET
# §32b o-projection addendum (r4): the int8 wo frees another
# H·Dp·d bytes (3.28 MB at d=1280) — MORE than the 492 KB by which
# bq=512 missed, and measured: with int8 wo, d=1280 bq=512 compiles
# and runs in BOTH heavy e2e contexts (bench turbo b32 chain8
# 1,084.6 → 1,096.6 RTFx, +1.1%; large-v2 b16 steady8 407.3 → 408.6,
# wash) — so the o_q budget admits the d=1280/bq=512 estimate (117.3e6)
# while still excluding d=1024/bq=768 (121.4e6 — bf16-wo failed
# standalone by 1.8M, int8 wo saves 2.1M, so it may JUST fit but is
# unproven in the e2e context; probe before raising this).
_VMEM_BUDGET_I8O = 118 * 1000 * 1000
_BQ_CANDIDATES = (768, 512, 384, 256, 128)


def _vmem_estimate(bq: int, s_pad: int, H: int, d: int, ff: int,
                   isz: int, mlp_q: bool = False,
                   o_q: bool = False) -> int:
    Dp = _LANE
    weights = (H * Dp * d * (1 if o_q else isz)
               + 2 * d * ff * (1 if mlp_q else isz))
    kv_windows = 2 * H * s_pad * Dp * isz * 2      # 2-level buffering
    q_window = H * bq * Dp * isz * 2
    h_io = 2 * bq * d * isz * 2
    af_scratch = bq * H * Dp * 4
    transient_f32 = bq * s_pad * 4 + bq * ff * 4 + 3 * bq * d * 4
    return (weights + kv_windows + q_window + h_io + af_scratch
            + int(2.5 * transient_f32))


def _budget(mlp_q: bool, o_q: bool) -> int:
    if mlp_q and o_q:
        return _VMEM_BUDGET_I8O
    return _VMEM_BUDGET_I8 if mlp_q else _VMEM_BUDGET


def auto_block_q(T: int, S: int, H: int, d: int, ff: int, isz: int,
                 mlp_q: bool = False, o_q: bool = False) -> int:
    """Largest q-block whose estimated program VMEM fits the v5e budget.

    768 stays the default through small (d<=768); medium drops to 512;
    large/turbo (d=1280, ff=5120) to 384 bf16, moving up to 512 under
    the int8 MLP+o weights (the o_q budget — measured boundary points
    in the comments above). Returns the smallest candidate even when
    nothing fits (the mode gate should then choose 'off')."""
    s_pad = _round_up(S, _LANE)
    for bq in _BQ_CANDIDATES:
        if bq > _round_up(T, 16):
            continue
        if (_vmem_estimate(bq, s_pad, H, d, ff, isz, mlp_q, o_q)
                <= _budget(mlp_q, o_q)):
            return bq
    return _BQ_CANDIDATES[-1]


def tail_fits_vmem(T: int, S: int, H: int, d: int, ff: int,
                   isz: int, mlp_q: bool = False,
                   o_q: bool = False) -> bool:
    """True when some q-block fits the VMEM budget (the auto-mode gate)."""
    s_pad = _round_up(S, _LANE)
    return any(_vmem_estimate(bq, s_pad, H, d, ff, isz, mlp_q, o_q)
               <= _budget(mlp_q, o_q) for bq in _BQ_CANDIDATES)


@functools.partial(
    jax.jit, static_argnames=("eps", "block_q", "interpret"))
def encoder_block_tail(q: jax.Array, k: jax.Array, v: jax.Array,
                       h_in: jax.Array,
                       wo_pad: jax.Array, fc1_w: jax.Array, fc2_w: jax.Array,
                       misc: jax.Array, *,
                       eps: float = 1e-5,
                       block_q: int | None = None,
                       interpret: bool = False) -> jax.Array:
    """Fused attention+o-proj+LN2+MLP block tail (see module docstring).

    Args:
      q: (B, T, H, D) — straight out of qkv_fused.
      k, v: (B, H, S, D) head-major (here S == T).
      h_in: (B, T, d) — the block's residual input.
      wo_pad: (H*128, d) o-projection with each head's input rows padded to
        a 128-lane slot, zero pad rows (pad_tail_weights).
      fc1_w: (d, ff); fc2_w: (ff, d) — compute dtype.
      misc: (1, 4*d + ff) fp32 = [o_b | fc1_b | fc2_b | ln2_g | ln2_b].
    Returns:
      (B, T, d) block output in h_in.dtype.
    """
    B, T, H, D = q.shape
    S = k.shape[2]
    d = h_in.shape[-1]
    ff = fc1_w.shape[-1]
    dtype = h_in.dtype
    mlp_q = fc1_w.dtype == jnp.int8          # §32b: misc carries the scales
    o_q = wo_pad.dtype == jnp.int8           # §32b o-proj experiment
    prec = jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None
    if block_q is None:
        block_q = _env_block(
            "WHISPER_TPU_ENC_BQ",
            auto_block_q(T, S, H, d, ff, jnp.dtype(dtype).itemsize,
                         mlp_q, o_q))

    qt = jnp.transpose(q, (0, 2, 1, 3))                   # (B, H, T, D)
    k = k.astype(dtype)
    v = v.astype(dtype)

    bq = min(block_q, _round_up(T, 16))
    t_pad = _round_up(T, bq)
    s_pad = _round_up(S, _LANE)
    if t_pad != T:
        qt = jnp.pad(qt, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
        h_in = jnp.pad(h_in, ((0, 0), (0, t_pad - T), (0, 0)))
    if s_pad != S:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, s_pad - S), (0, 0)))

    kern = functools.partial(
        _tail_kernel, H=H, D=D, d=d, ff=ff, S=S, s_pad=s_pad,
        eps=eps, dtype=dtype, prec=prec, mlp_q=mlp_q, o_q=o_q,
        interpret=interpret)

    grid = (B, t_pad // bq)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, H, bq, D), lambda b, t: (b, 0, t, 0)),   # q
            pl.BlockSpec((1, H, s_pad, D), lambda b, t: (b, 0, 0, 0)),  # k
            pl.BlockSpec((1, H, s_pad, D), lambda b, t: (b, 0, 0, 0)),  # v
            pl.BlockSpec((1, bq, d), lambda b, t: (b, t, 0)),         # h_in
            pl.BlockSpec((H * _LANE, d), lambda b, t: (0, 0)),        # wo
            pl.BlockSpec((d, ff), lambda b, t: (0, 0)),               # fc1
            pl.BlockSpec((ff, d), lambda b, t: (0, 0)),               # fc2
            pl.BlockSpec((1, misc.shape[-1]), lambda b, t: (0, 0)),   # misc
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, t_pad, d), dtype),
        scratch_shapes=[pltpu.VMEM((bq, H * _LANE), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=(4 * B * H * T * S * D            # attention
                   + 2 * B * T * (H * D) * d        # o-proj
                   + 4 * B * T * d * ff),           # fc1 + fc2
            bytes_accessed=(B * H * (t_pad + 2 * s_pad) * D
                            + 2 * B * t_pad * d) * dtype.itemsize,
            transcendentals=B * H * T * S + B * T * ff,
        ),
        interpret=interpret,
    )(qt, k, v, h_in, wo_pad, fc1_w, fc2_w, misc)

    return out[:, :T, :]


# ---------------------------------------------------------------------------
# operand preparation (per layer, inside the encoder scan body)
# ---------------------------------------------------------------------------

def pad_tail_weights(o_w: jax.Array, n_heads: int, dtype) -> jax.Array:
    """(H*D, d) o-projection -> (H*128, d) with each head's D input rows at
    a 128-aligned slot and ZERO pad rows (the kernel's af scratch keeps pad
    lanes zero, so padding is exact)."""
    din, d = o_w.shape
    D = din // n_heads
    Dp = _LANE
    if D == Dp:
        return o_w.astype(dtype)
    w = o_w.reshape(n_heads, D, d)
    w = jnp.pad(w, ((0, 0), (0, Dp - D), (0, 0)))
    return w.reshape(n_heads * Dp, d).astype(dtype)


def pack_tail_misc(lp: dict, fc1_s: jax.Array | None = None,
                   fc2_s: jax.Array | None = None,
                   wo_s: jax.Array | None = None) -> jax.Array:
    """(1, 4*d + ff) fp32 parameter pack for one layer:
    [o_b | fc1_b | fc2_b | mlp_ln_g | mlp_ln_b]; with fc1_s/fc2_s
    (the §32b int8-MLP per-column weight scales, (ff,) and (d,)) the
    pack extends to (1, 5*d + 2*ff), and with wo_s (int8 o-projection
    experiment, (d,)) to (1, 6*d + 2*ff)."""
    parts = [lp["attn"]["o"]["b"], lp["fc1"]["b"], lp["fc2"]["b"],
             lp["mlp_ln"]["g"], lp["mlp_ln"]["b"]]
    if fc1_s is not None:
        parts += [fc1_s, fc2_s]
    if wo_s is not None:
        parts += [wo_s]
    return jnp.concatenate(
        [p.astype(jnp.float32) for p in parts])[None, :]
