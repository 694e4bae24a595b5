"""Fused decoder-step megakernel (Pallas/TPU): ONE kernel program computes a
full incremental decode step through ALL decoder layers — self-attention
(with the new token's K/V folded in), cross-attention over the precomputed
encoder K/V, and the MLP — leaving only the tied logit projection, rules and
argmax outside.

Why (VERDICT r1 Next #1): the XLA decode step at Whisper-Tiny batch 8 costs
~1.09 ms against a ~0.2 ms HBM roofline — the gap is ~60 small fusion
launches per step, each with fixed cost. This kernel replaces all of them
with one program whose grid is (layers, phases) with phase segments
[qkv-blocks | self-kv tiles | cross-kv tiles | mlp-blocks]: weights
stream through double-buffered windows (the fused-QKV projection as
column blocks, the MLP as paired fc1-column/fc2-row blocks accumulated in
fp32 scratch — whole-matrix windows fit tiny but blow the 128 MiB VMEM at
large-v3-turbo dims), self/cross cache tiles stream likewise, and the
hidden state lives in VMEM scratch across the whole step. It is the TPU analogue of the reference's register-cached
single-token decode path (reference layers.mojo:186-272) — scaled from one
query head in SIMD registers to the entire decoder in VMEM.

Mosaic-layout ground rules this kernel is built on (all measured/validated
on the real v5e via ops/decode_attention.py and a VMEM probe):
  * Lane-dimension reshapes ((B, H*Dh) -> (B*H, Dh)) are unsupported shape
    casts, and lane slices at odd-64 offsets carry a {0,64} layout offset
    that tpu.concatenate / cross-offset stores refuse ("result/input offset
    mismatch on non-concat dimension" — observed on the real toolchain).
    So projections run as full-width MXU matmuls in the (B, d) lane layout
    with each head's output columns PADDED to a 128-lane stride (Dhp):
    one (B,d)x(d,3*H*Dhp) fused-QKV dot per layer and single full-width
    dots for cq/o/co. Every per-head slice then starts at a 128-aligned
    lane (layout offset 0), so the slice->scratch-row stores that build the
    head-outer (H*B, Dh) attention rows are legal, as are the reverse
    stores into a padded (B, H*Dhp) row that feeds the o/co projection
    (whose weight rows are padded to match). Padding costs ~2x on the four
    projection matrices' bytes (~+7% of per-step HBM) and replaces the
    round-1 formulation (30 per-head (B,384)x(384,64) dots per layer) that
    underfilled the MXU and measured 1.81 ms/step.
  * q[:, None, :] * k and p[:, :, None] * v broadcast-reduces compile and
    beat per-head MXU matvecs at q_len==1 (decode_attention_bh: 12.4 us vs
    XLA 19.3 us, self-attn shape, b8).
  * v5e VMEM is ~128 MiB (a 120 MB scratch compiles), so per-layer weights
    plus four double-buffered KV streams fit easily; vmem_limit_bytes=100MB.

Numerics: bf16 rounding points match the XLA path (projection outputs,
bias adds and residual adds round to bf16; LayerNorm and softmax statistics
stay fp32), so greedy tokens agree with decoder_forward. The only
accumulation-order differences are the online softmax (vs materialized) and
head-blocked output projections — both fp32.

Cache-layout contract: this kernel reads/writes the self-cache in
HEAD-OUTER layout (L, H*B, S, Dh) (per-head rows contiguous); cross K/V the
same. models/whisper.py converts after prefill (once per transcription).

Masking follows the framework contract: (kv_len, causal, q_offset) scalars;
dead self tiles are clamped to the last live tile (no DMA) and skipped
(no compute), exactly like decode_attention.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)


def _erf(z):
    """erf for Mosaic (neither lax.erf nor lax.erfc lower to TPU Pallas):
    Abramowitz & Stegun 7.1.26 rational approximation, |error| <= 1.5e-7 —
    ~50x below bf16 resolution, so bf16 GeLU outputs match true erf after
    rounding except at measure-zero rounding boundaries."""
    a = (0.254829592, -0.284496736, 1.421413741, -1.453152027, 1.061405429)
    zs = jnp.abs(z)
    t = 1.0 / (1.0 + 0.3275911 * zs)
    poly = t * (a[0] + t * (a[1] + t * (a[2] + t * (a[3] + t * a[4]))))
    e = 1.0 - poly * jnp.exp(-zs * zs)
    return jnp.sign(z) * e


def _gelu_exact(x32, interpret: bool):
    """Exact (erf) GeLU, matching models.whisper.gelu. Interpret mode (CPU
    parity tests) uses the true erf; compiled Mosaic uses _erf."""
    if interpret:
        return jax.nn.gelu(x32, approximate=False)
    return 0.5 * x32 * (1.0 + _erf(x32 * (2.0 ** -0.5)))


def _ln(x32, g, b, eps):
    """fp32 LayerNorm matching models.whisper.layer_norm numerics."""
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), axis=-1, keepdims=True)
    return (x32 - mean) * jax.lax.rsqrt(var + eps) * g + b


def _online_update(q_s, m_s, l_s, acc_s, kb, vb, valid):
    """One online-softmax tile update, vectorized over all (h, b) rows.
    kb/vb: (HB, bk, Dh); valid: (1, bk)."""
    q = q_s[...]                                        # (HB, Dh) pre-scaled
    s = jnp.sum(q[:, None, :] * kb.astype(jnp.float32), axis=-1)  # (HB, bk)
    s = jnp.where(valid, s, _MASK_VALUE)
    m_prev, l_prev = m_s[...], l_s[...]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_prev - m_new)
    m_s[...] = m_new
    l_s[...] = l_prev * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_s[...] = (acc_s[...] * alpha
                  + jnp.sum(p[:, :, None] * vb.astype(jnp.float32), axis=1))


def _kernel(info_ref,                                   # scalar prefetch
            h0_ref, wqkv, wcq, wo, wco, fc1_w, fc2_w,
            qkvb, fc1b, miscp, miscd,
            sk_ref, sv_ref, ck_ref, cv_ref,             # streamed inputs
            hout_ref, knew_ref, vnew_ref,               # outputs
            h_s, y_s, qkv_s, af_s, q_s, m_s, l_s, acc_s, acc2_s,  # scratch
            *, B: int, H: int, Dh: int, Dhp: int, d: int, ff: int,
            n_qkv: int, blkq: int, n_mlp: int, blkm: int,
            n_self: int, n_cross: int, bk_self: int, bk_cross: int,
            s_cross: int, n_layers: int, eps: float, dtype, prec,
            interpret: bool):
    l = pl.program_id(0)
    j = pl.program_id(1)
    kv_len = info_ref[0]                 # includes the current token
    scale = Dh ** -0.5
    f32 = jnp.float32
    # phase segment bases: [qkv blocks | self tiles | cross tiles | mlp]
    bs = n_qkv
    bc = n_qkv + n_self
    bm = bc + n_cross

    def rnd(x32):
        """Round fp32 to the compute dtype and re-upcast — replicates the
        XLA path's bf16 storage points so tokens match."""
        return x32.astype(dtype).astype(f32)

    md = miscd[0, 0]                      # (Pd,) fp32 packed lane-wise params
    cqb = miscp[0, 0]                     # (H*Dhp,) padded cq bias

    def seg(off, n):
        return md[off:off + n]

    # miscd layout: [o_b | co_b | fc2_b | ln1_g ln1_b ln2_g ln2_b
    #                ln3_g ln3_b]; qkv/fc1 biases arrive as their own
    # block-windowed inputs (qkvb, fc1b)
    o_ob, o_cob, o_fc2b = 0, d, 2 * d
    o_ln = 3 * d

    def dot(x, w):
        return jax.lax.dot_general(
            x.astype(dtype), w, (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=prec)

    def head_rows(hi):
        return slice(hi * B, (hi + 1) * B)

    def hslice(slot):
        """128-aligned lane slice of padded head-slot `slot` out of the
        blocked qkv scratch. blkq is a multiple of Dhp (128), so a head
        slot never straddles a block boundary and both the block index and
        lane offset are static (layout offset 0 — Mosaic-legal to store
        anywhere)."""
        c0 = slot * Dhp
        return qkv_s[c0 // blkq, :, c0 % blkq: c0 % blkq + Dh]

    def fill_af(a):
        """Scatter per-head (B, Dh) sublane groups of a (HB, Dh) into the
        padded lane-major scratch af_s (B, H*Dhp); pad lanes stay zero
        (wo/wco pad rows are also zero, so they contribute nothing)."""
        af_s[...] = jnp.zeros((B, H * Dhp), f32)
        for hi in range(H):
            af_s[:, hi * Dhp: hi * Dhp + Dh] = rnd(a[head_rows(hi)])

    # ---------------- phase 0: layer input + LN1 --------------------------
    @pl.when(j == 0)
    def _():
        h = jnp.where(l == 0, h0_ref[...].astype(f32), h_s[...])
        h_s[...] = h
        y_s[...] = rnd(_ln(h, seg(o_ln, d), seg(o_ln + d, d), eps))

    # ---------------- qkv projection blocks (j in [0, n_qkv)) -------------
    # The XLA path's fused-QKV projection with per-head columns padded to
    # 128-lane slots, streamed as (d, blkq) column blocks so large models'
    # weights never exceed VMEM (whole-matrix windows at d=1280 blew the
    # 128 MiB budget — VERDICT r2 #5). Per-column accumulation identical
    # to the unpadded single dot.
    @pl.when(j < n_qkv)
    def _():
        blk = rnd(rnd(dot(y_s[...], wqkv[0])) + rnd(qkvb[0, 0][None, :]))
        for t in range(n_qkv):                       # static store target
            @pl.when(j == t)
            def _(blk=blk, t=t):
                qkv_s[t] = blk

    # ---------------- scatter heads + seed online softmax -----------------
    @pl.when(j == n_qkv - 1)
    def _():
        for hi in range(H):                          # static unroll
            rows = head_rows(hi)
            q_h = hslice(hi)
            k_h = hslice(H + hi)
            v_h = hslice(2 * H + hi)
            knew_ref[0, rows] = k_h.astype(knew_ref.dtype)
            vnew_ref[0, rows] = v_h.astype(vnew_ref.dtype)
            qs = q_h * scale
            q_s[rows] = qs
            # seed the online softmax with the new token (sees itself)
            s_new = jnp.sum(qs * k_h, axis=-1, keepdims=True)   # (B, 1)
            m_s[rows] = s_new
            l_s[rows] = jnp.ones_like(s_new)
            acc_s[rows] = v_h

    # ---------------- self-attention tiles (stale cache: kv_len-1 rows) ---
    @pl.when(jnp.logical_and(
        jnp.logical_and(j >= bs, j < bs + n_self),
        (j - bs) * bk_self < kv_len - 1))
    def _():
        k_pos = ((j - bs) * bk_self
                 + jax.lax.broadcasted_iota(jnp.int32, (1, bk_self), 1))
        _online_update(q_s, m_s, l_s, acc_s, sk_ref[0], sv_ref[0],
                       k_pos < kv_len - 1)

    # ---------------- finalize self, o-proj, start cross ------------------
    @pl.when(j == bs + n_self - 1)
    def _():
        a = acc_s[...] / jnp.maximum(l_s[...], 1e-30)        # (HB, Dh)
        fill_af(a)
        delta = dot(af_s[...], wo[0])                # one (H*Dhp, d) dot
        h = rnd(h_s[...] + rnd(rnd(delta) + rnd(seg(o_ob, d)[None, :])))
        h_s[...] = h
        y = rnd(_ln(h, seg(o_ln + 2 * d, d), seg(o_ln + 3 * d, d), eps))
        q2 = rnd(rnd(dot(y, wcq[0])) + rnd(cqb[None, :]))
        for hi in range(H):
            q_s[head_rows(hi)] = q2[:, hi * Dhp: hi * Dhp + Dh] * scale
        m_s[...] = jnp.full_like(m_s[...], _MASK_VALUE)
        l_s[...] = jnp.zeros_like(l_s[...])
        acc_s[...] = jnp.zeros_like(acc_s[...])

    # ---------------- cross-attention tiles -------------------------------
    @pl.when(jnp.logical_and(j >= bc, j < bc + n_cross))
    def _():
        t = j - bc
        k_pos = (t * bk_cross
                 + jax.lax.broadcasted_iota(jnp.int32, (1, bk_cross), 1))
        _online_update(q_s, m_s, l_s, acc_s, ck_ref[0], cv_ref[0],
                       k_pos < s_cross)

    # ---------------- finalize cross, LN3 ---------------------------------
    @pl.when(j == bc + n_cross - 1)
    def _():
        a = acc_s[...] / jnp.maximum(l_s[...], 1e-30)
        fill_af(a)
        delta = dot(af_s[...], wco[0])
        h = rnd(h_s[...] + rnd(rnd(delta) + rnd(seg(o_cob, d)[None, :])))
        h_s[...] = h
        y_s[...] = rnd(_ln(h, seg(o_ln + 4 * d, d), seg(o_ln + 5 * d, d),
                           eps))
        acc2_s[...] = jnp.zeros((B, d), f32)

    # ---------------- MLP blocks (fc1 column / fc2 row pairs) -------------
    # Each phase computes one ff-block: t1 = gelu(y @ fc1[:, blk] + b[blk])
    # then accumulates t1 @ fc2[blk, :] into the fp32 acc2 scratch. With
    # n_mlp == 1 the accumulation grouping is identical to the single-dot
    # formulation (bit-exact vs the XLA path at fp32).
    @pl.when(j >= bm)
    def _():
        t1 = rnd(rnd(dot(y_s[...], fc1_w[0])) + rnd(fc1b[0, 0][None, :]))
        t1 = rnd(_gelu_exact(t1, interpret))
        acc2_s[...] += dot(t1, fc2_w[0])

    # ---------------- finalize MLP + layer output -------------------------
    @pl.when(j == bm + n_mlp - 1)
    def _():
        t2 = rnd(rnd(acc2_s[...]) + rnd(seg(o_fc2b, d)[None, :]))
        h = rnd(h_s[...] + t2)
        h_s[...] = h

        @pl.when(l == n_layers - 1)
        def _():
            hout_ref[...] = h.astype(hout_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _pick_block(HB: int, s: int, Dh: int, dtype_bytes: int) -> int:
    """Tile size targeting ~4 MB per KV block (v5e VMEM ~128 MiB; four
    double-buffered streams + resident weights stay well inside)."""
    target = 4 * 1024 * 1024
    bk = max(128, min(512, target // (HB * Dh * dtype_bytes) // 128 * 128))
    return min(bk, _round_up(s, 128))


def _pick_wblock(total: int, rows: int, itemsize: int, unit: int,
                 budget: int) -> int:
    """Largest weight column-block that divides `total`, is a multiple of
    `unit` (128-lane head slot for qkv; 128 for ff), and whose
    double-buffered (rows, blk) window fits `budget` bytes. Whole-matrix
    windows at large-v3-turbo dims (d=1280, 3*H*Dhp=7680, ff=5120) blow
    the 128 MiB VMEM — this is what lets the megakernel compile there."""
    n_units = total // unit
    for k in range(1, n_units + 1):
        if n_units % k:
            continue
        blk = total // k
        if 2 * rows * blk * itemsize <= budget:
            return blk
    return unit


@functools.partial(
    jax.jit,
    static_argnames=("n_layers", "n_heads", "eps", "interpret",
                     "block_self", "block_cross", "block_qkv", "block_mlp",
                     "w_budget"))
def fused_decoder_step(h0: jax.Array,
                       wqkv, wcq, wo, wco, fc1_w, fc2_w,
                       qkvb, fc1b, miscp, miscd,
                       self_k, self_v, cross_k, cross_v,
                       kv_len, *, n_layers: int, n_heads: int,
                       eps: float = 1e-5,
                       interpret: bool = False,
                       block_self: int = 0, block_cross: int = 0,
                       block_qkv: int = 0, block_mlp: int = 0,
                       w_budget: int = 8 * 1024 * 1024):
    """Run one fused decode step (see module docstring).

    Args:
      h0: (B, d) compute dtype — token embedding + positional embedding.
      wqkv: (L, d, 3*H*Dhp) fused q|k|v projection, head columns padded to
        128-lane slots; wcq: (L, d, H*Dhp); wo/wco: (L, H*Dhp, d) with
        zeroed pad rows — compute dtype (see split_weights). wqkv streams
        as (d, blkq) column blocks; fc1/fc2 as paired col/row blocks.
      fc1_w: (L, d, ff); fc2_w: (L, ff, d).
      qkvb: (L, 1, 3*H*Dhp) fp32 padded qkv bias (block-windowed with wqkv).
      fc1b: (L, 1, ff) fp32 fc1 bias (block-windowed with fc1_w).
      miscp: (L, 1, H*Dhp) fp32 — padded cq bias.
      miscd: (L, 1, Pd) fp32 — lane-wise [o_b | co_b | fc2_b |
        ln1_g ln1_b ln2_g ln2_b ln3_g ln3_b].
      self_k/self_v: (L, H*B, S_self, Dh) stale cache, HEAD-OUTER rows
        (current token NOT yet written).
      cross_k/cross_v: (L, H*B, S_cross, Dh), head-outer.
      kv_len: scalar int32 — valid length INCLUDING the current token.
      block_self/block_cross: KV tile size override (0 = auto ~4 MB).
    Returns:
      h_out (B, d) compute dtype (pre-final-LayerNorm),
      k_new, v_new: (L, H*B, Dh) — scatter at position kv_len - 1.
    """
    L, HB, S_self, Dh = self_k.shape
    B, d = h0.shape
    H = n_heads
    Dhp = _round_up(Dh, 128)
    ff = fc1_w.shape[2]
    S_cross = cross_k.shape[2]
    dtype = h0.dtype
    itemsize = jnp.dtype(dtype).itemsize
    prec = (jax.lax.Precision.HIGHEST if dtype == jnp.float32 else None)

    blkq = block_qkv or _pick_wblock(3 * H * Dhp, d, itemsize, Dhp, w_budget)
    blkm = block_mlp or _pick_wblock(ff, d, itemsize, 128, w_budget)
    n_qkv = 3 * H * Dhp // blkq
    n_mlp = ff // blkm

    bk_self = (block_self or
               _pick_block(HB, S_self, Dh, jnp.dtype(self_k.dtype).itemsize))
    bk_cross = (block_cross or
                _pick_block(HB, S_cross, Dh,
                            jnp.dtype(cross_k.dtype).itemsize))
    bk_self = min(bk_self, _round_up(S_self, 128))
    bk_cross = min(bk_cross, _round_up(S_cross, 128))

    def _vmem_est(bks, bkc):
        """Double-buffered window bytes (the compiler's 2-level buffering of
        every streamed input) + weights; must stay under the ~128 MiB v5e
        VMEM with margin for scratch/spills."""
        kv = 2 * 2 * HB * Dh * jnp.dtype(self_k.dtype).itemsize * (bks + bkc)
        wb = 2 * itemsize * (
            d * blkq + d * H * Dhp + 2 * H * Dhp * d + d * blkm + blkm * d)
        return kv + wb

    cap = 92 * 1024 * 1024
    while bk_cross > 64 and _vmem_est(bk_self, bk_cross) > cap:
        bk_cross -= 64
    while bk_self > 64 and _vmem_est(bk_self, bk_cross) > cap:
        bk_self -= 64
    sp_self = _round_up(S_self, bk_self)
    sp_cross = _round_up(S_cross, bk_cross)
    n_self = sp_self // bk_self
    n_cross = sp_cross // bk_cross

    def pad_s(x, sp):
        if x.shape[2] != sp:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, sp - x.shape[2]), (0, 0)))
        return x

    sk = pad_s(self_k, sp_self)
    sv = pad_s(self_v, sp_self)
    ck = pad_s(cross_k, sp_cross)
    cv = pad_s(cross_v, sp_cross)
    info = jnp.asarray(kv_len, jnp.int32).reshape(1)

    bs_base = n_qkv
    bc_base = n_qkv + n_self
    bm_base = bc_base + n_cross

    def w_idx(l, j, info_ref):
        del j, info_ref
        return (l, 0, 0)

    def qkv_idx(l, j, info_ref):
        del info_ref
        return (l, 0, jnp.clip(j, 0, n_qkv - 1))

    def self_idx(l, j, info_ref):
        live = jnp.maximum(pl.cdiv(info_ref[0] - 1, bk_self), 1) - 1
        t = jnp.clip(j - bs_base, 0, n_self - 1)
        return (l, 0, jnp.minimum(t, live), 0)

    def cross_idx(l, j, info_ref):
        del info_ref
        return (l, 0, jnp.clip(j - bc_base, 0, n_cross - 1), 0)

    def fc1_idx(l, j, info_ref):
        del info_ref
        return (l, 0, jnp.clip(j - bm_base, 0, n_mlp - 1))

    def fc2_idx(l, j, info_ref):
        del info_ref
        return (l, jnp.clip(j - bm_base, 0, n_mlp - 1), 0)

    kern = functools.partial(
        _kernel, B=B, H=H, Dh=Dh, Dhp=Dhp, d=d, ff=ff,
        n_qkv=n_qkv, blkq=blkq, n_mlp=n_mlp, blkm=blkm,
        n_self=n_self, n_cross=n_cross, bk_self=bk_self, bk_cross=bk_cross,
        s_cross=S_cross, n_layers=n_layers, eps=eps, dtype=dtype,
        prec=prec, interpret=interpret)

    Pd = miscd.shape[2]
    h_out, k_new, v_new = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, bm_base + n_mlp),
            in_specs=[
                pl.BlockSpec((B, d), lambda l, j, *_: (0, 0)),      # h0
                pl.BlockSpec((1, d, blkq), qkv_idx),                # wqkv
                pl.BlockSpec((1, d, H * Dhp), w_idx),               # wcq
                pl.BlockSpec((1, H * Dhp, d), w_idx),               # wo
                pl.BlockSpec((1, H * Dhp, d), w_idx),               # wco
                pl.BlockSpec((1, d, blkm), fc1_idx),                # fc1
                pl.BlockSpec((1, blkm, d), fc2_idx),                # fc2
                pl.BlockSpec((1, 1, blkq), qkv_idx),                # qkvb
                pl.BlockSpec((1, 1, blkm), fc1_idx),                # fc1b
                pl.BlockSpec((1, 1, H * Dhp), w_idx),               # miscp
                pl.BlockSpec((1, 1, Pd), w_idx),                    # miscd
                pl.BlockSpec((1, HB, bk_self, Dh), self_idx),       # sk
                pl.BlockSpec((1, HB, bk_self, Dh), self_idx),       # sv
                pl.BlockSpec((1, HB, bk_cross, Dh), cross_idx),     # ck
                pl.BlockSpec((1, HB, bk_cross, Dh), cross_idx),     # cv
            ],
            out_specs=[
                pl.BlockSpec((B, d), lambda l, j, *_: (0, 0)),      # h_out
                pl.BlockSpec((1, HB, Dh), lambda l, j, *_: (l, 0, 0)),
                pl.BlockSpec((1, HB, Dh), lambda l, j, *_: (l, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((B, d), jnp.float32),       # h
                pltpu.VMEM((B, d), jnp.float32),       # y (LN1 / LN3 out)
                pltpu.VMEM((n_qkv, B, blkq), jnp.float32),  # qkv blocks
                pltpu.VMEM((B, H * Dhp), jnp.float32),  # af (padded o-proj in)
                pltpu.VMEM((HB, Dh), jnp.float32),     # q (pre-scaled)
                pltpu.VMEM((HB, 1), jnp.float32),      # m
                pltpu.VMEM((HB, 1), jnp.float32),      # l
                pltpu.VMEM((HB, Dh), jnp.float32),     # acc
                pltpu.VMEM((B, d), jnp.float32),       # acc2 (MLP partials)
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, d), dtype),
            jax.ShapeDtypeStruct((L, HB, Dh), self_k.dtype),
            jax.ShapeDtypeStruct((L, HB, Dh), self_v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=112 * 1024 * 1024),
        interpret=interpret,
    )(info, h0, wqkv, wcq, wo, wco, fc1_w, fc2_w, qkvb, fc1b, miscp, miscd,
      sk, sv, ck, cv)

    return h_out, k_new, v_new


# ---------------------------------------------------------------------------
# operand preparation (once per transcription, outside the decode loop)
# ---------------------------------------------------------------------------

def _pad_head_cols(w: jax.Array, n_heads: int) -> jax.Array:
    """(L, d, n_heads*Dh) -> (L, d, n_heads*Dhp): pad each head's output
    columns to a 128-lane slot so in-kernel per-head slices are
    tile-aligned (layout offset 0). Pad columns are zero."""
    L, d, dout = w.shape
    Dh = dout // n_heads
    Dhp = _round_up(Dh, 128)
    if Dhp == Dh:
        return w
    w4 = w.reshape(L, d, n_heads, Dh)
    w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, 0), (0, Dhp - Dh)))
    return w4.reshape(L, d, n_heads * Dhp)


def _pad_head_rows(w: jax.Array, n_heads: int) -> jax.Array:
    """(L, n_heads*Dh, d) -> (L, n_heads*Dhp, d) with ZERO pad rows (pad
    lanes of the af scratch are also zero, so padding is exact)."""
    L, din, d = w.shape
    Dh = din // n_heads
    Dhp = _round_up(Dh, 128)
    if Dhp == Dh:
        return w
    w4 = w.reshape(L, n_heads, Dh, d)
    w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, Dhp - Dh), (0, 0)))
    return w4.reshape(L, n_heads * Dhp, d)


def split_weights(layers: dict, n_heads: int, dtype) -> tuple:
    """Head-slot-padded full-width weight matrices from a stacked
    decoder-layer pytree ((in, out)-layout linears, weights.py contract).

    Returns (wqkv (L, d, 3*H*Dhp), wcq (L, d, H*Dhp), wo/wco
    (L, H*Dhp, d)). The q|k|v concatenation along the OUTPUT axis matches
    the XLA path's qkv_fused per-column accumulation exactly (padding adds
    zero columns/rows, never changing live values); o/co keep their
    natural head-major input-row order, which is the lane order the
    kernel's padded af scratch assembles."""
    a, c = layers["attn"], layers["cross_attn"]
    wqkv = jnp.concatenate(
        [_pad_head_cols(a["q"]["w"], n_heads),
         _pad_head_cols(a["k"]["w"], n_heads),
         _pad_head_cols(a["v"]["w"], n_heads)], axis=-1).astype(dtype)
    return (wqkv,
            _pad_head_cols(c["q"]["w"], n_heads).astype(dtype),
            _pad_head_rows(a["o"]["w"], n_heads).astype(dtype),
            _pad_head_rows(c["o"]["w"], n_heads).astype(dtype))


def _pad_head_vec(b: jax.Array, n_heads: int) -> jax.Array:
    """(L, n_heads*Dh) bias -> (L, n_heads*Dhp), zero pad lanes."""
    L, dout = b.shape
    Dh = dout // n_heads
    Dhp = _round_up(Dh, 128)
    if Dhp == Dh:
        return b.astype(jnp.float32)
    b3 = b.astype(jnp.float32).reshape(L, n_heads, Dh)
    b3 = jnp.pad(b3, ((0, 0), (0, 0), (0, Dhp - Dh)))
    return b3.reshape(L, n_heads * Dhp)


def pack_misc(layers: dict, n_heads: int
              ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(qkvb, fc1b, miscp, miscd) fp32 packed parameter arrays (layouts in
    the kernel docstring): qkvb the head-slot-PADDED fused qkv bias
    (block-windowed alongside wqkv), fc1b the fc1 bias (block-windowed
    alongside fc1_w), miscp the padded cq bias, miscd the unpadded
    o/co/fc2 biases and LayerNorm vectors. Values come from the live
    (possibly bf16) params so rounding matches the XLA path."""
    a, c = layers["attn"], layers["cross_attn"]
    qkvb = jnp.concatenate(
        [_pad_head_vec(a["q"]["b"], n_heads),
         _pad_head_vec(a["k"]["b"], n_heads),
         _pad_head_vec(a["v"]["b"], n_heads)], axis=-1)[:, None, :]
    fc1b = layers["fc1"]["b"].astype(jnp.float32)[:, None, :]
    miscp = _pad_head_vec(c["q"]["b"], n_heads)[:, None, :]
    parts = [
        a["o"]["b"], c["o"]["b"], layers["fc2"]["b"],
        layers["attn_ln"]["g"], layers["attn_ln"]["b"],
        layers["cross_ln"]["g"], layers["cross_ln"]["b"],
        layers["mlp_ln"]["g"], layers["mlp_ln"]["b"],
    ]
    miscd = jnp.concatenate([p.astype(jnp.float32) for p in parts],
                            axis=-1)[:, None, :]          # (L, 1, 9d)
    return qkvb, fc1b, miscp, miscd


def to_head_outer(x: jax.Array) -> jax.Array:
    """(L, B, H, S, Dh) framework cache layout -> (L, H*B, S, Dh) kernel
    layout (head-outer rows; done once per transcription after prefill)."""
    L, B, H, S, Dh = x.shape
    return x.transpose(0, 2, 1, 3, 4).reshape(L, H * B, S, Dh)


def from_head_outer(x: jax.Array, batch: int) -> jax.Array:
    """(L, H*B, S, Dh) -> (L, B, H, S, Dh)."""
    L, HB, S, Dh = x.shape
    return x.reshape(L, HB // batch, batch, S, Dh).transpose(0, 2, 1, 3, 4)
