"""Whisper encoder/decoder as pure functions over a params pytree.

Design (TPU-first, not a translation of the reference):
  * All functions are pure and jit-compatible with static shapes; the KV
    cache is a fixed-shape (L, B, S_max, H, Dh) array pair updated with
    `lax.dynamic_update_slice` — replacing the reference's preallocated
    cache + append cursor + aliasing `Tensor.view` (layers.mojo:14-69,
    :130-147).
  * Transformer layers are *stacked* along a leading axis and traversed with
    `lax.scan`, so XLA compiles one layer body regardless of depth — the
    tiny/…/large-v3 family differs only in array shapes.
  * Elementwise stages (LayerNorm, GeLU, residual adds, softmax) are plain
    jnp ops; XLA fuses them into the surrounding matmuls. The reference
    hand-vectorizes each of these (whisper_tensor.mojo:249-355); on TPU that
    is the compiler's job.
  * Linear weights are stored (in, out) so every projection is a plain
    `x @ w` MXU matmul; the HF/reference (out, in) layout is transposed once
    at load time (weights.py), mirroring how the reference pre-transposes
    conv weights at load (whisper.mojo:61-63).

Parity notes:
  * k_proj has no bias (HF contract; reference load order layers.mojo:96-103).
    For a uniform pytree the bias slot exists but is zeros.
  * GeLU is the exact erf form, matching torch nn.GELU / HF "gelu". (The
    reference uses the tanh approximation, whisper_tensor.mojo:288-308, and
    still matched PyTorch tokens; we match torch exactly.)
  * Attention scale = head_dim**-0.5 applied to q (layers.mojo:184).
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from whisper_tpu.config import WhisperConfig
from whisper_tpu.ops.attention import (
    multi_head_attention,
    multi_head_attention_quant,
)

Params = Any    # nested dict pytree
HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# primitives
# ---------------------------------------------------------------------------

def layer_norm(x: jax.Array, g: jax.Array, b: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """Row-wise LayerNorm (reference whisper_tensor.mojo:249-285). Computed
    in fp32 regardless of activation dtype."""
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * g + b).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    """Exact (erf) GeLU, matching torch nn.GELU."""
    return jax.nn.gelu(x, approximate=False)


def _wq_dequant(p: Params, dtype) -> jax.Array:
    """Effective weight of an int8 weight-quantized linear: values times the
    per-output-column scale, materialized IN-GRAPH in the compute dtype.

    This is the `deq` formulation measured in benchmarks/wq_ab.py
    (DESIGN.md §28): XLA fuses the convert+scale into the consuming dot's
    operand read, so the per-step HBM weight traffic is the int8 bytes —
    the dequantized tensor is never written to HBM, and crucially XLA does
    NOT hoist it out of the decode while_loop (measured d1024 L24: 321
    µs/step vs the 492 µs bf16 weight-read floor; a hoisted bf16 copy
    would pin the slope at the bf16 floor)."""
    return p["w"].astype(dtype) * p["w_s"][..., None, :].astype(dtype)


def linear(x: jax.Array, p: Params, precision=HIGHEST) -> jax.Array:
    """x @ w + b with w stored (in, out); int8 weight-quantized linears
    ({"w": int8, "w_s": per-out-column scale}) dequantize in-graph."""
    w = _wq_dequant(p, x.dtype) if "w_s" in p else p["w"]
    return jnp.dot(x, w, precision=precision) + p["b"]


def qkv_fused(y: jax.Array, attn: Params, n_heads: int
              ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """One fused (d -> 3d) projection instead of three d->d matmuls, then
    split. Mathematically identical per output column (concatenation along
    the output axis changes no accumulation order), but one MXU dispatch
    instead of three — the per-step dispatch count is the decode-latency
    lever on TPU. The concatenated weight is loop-invariant, so XLA hoists
    it out of the decode while_loop.

    Returns q (B,T,H,Dh), k (B,H,T,Dh), v (B,H,T,Dh)."""
    if "w_s" in attn["q"]:
        w = jnp.concatenate([_wq_dequant(attn[n], y.dtype)
                             for n in ("q", "k", "v")], axis=-1)
    else:
        w = jnp.concatenate([attn["q"]["w"], attn["k"]["w"], attn["v"]["w"]],
                            axis=-1)
    b = jnp.concatenate([attn["q"]["b"], attn["k"]["b"], attn["v"]["b"]])
    qkv = jnp.dot(y, w, precision=HIGHEST) + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (split_heads(q, n_heads), split_heads_hm(k, n_heads),
            split_heads_hm(v, n_heads))


def _rowquant_dyn(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Dynamic per-token (last-axis) symmetric int8 for ACTIVATIONS:
    (..., K) -> (int8 values, f32 scales (..., 1)). Scales are data-
    dependent, computed in-graph each call (unlike weight scales, which
    are static per checkpoint)."""
    xf = x.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0,
                    1e-10)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def linear_i8dyn(x: jax.Array, p: Params, dtype) -> jax.Array:
    """s8 x s8 MXU dot: dynamic per-token activation quant x per-output-
    column weight quant, int32 accumulate, exact rescale on the output.

    The ENCODER's serving-mode matmul (cfg.encoder_quant / DESIGN.md §32):
    at d_model >= 1024 the encoder is MXU-compute-bound (~36-40%
    utilization, §25) and v5e int8 MXU peak is ~2x bf16 — the opposite
    trade from the decode loop, where the bandwidth-bound §28 measurement
    made dequant-streaming (`deq`) the winner. Weights may be pre-quantized
    ({"w": int8, "w_s": scales}) or quantized in-graph (loop-invariant:
    XLA hoists it out of any scan/loop)."""
    if "w_s" in p:
        wq, ws = p["w"], p["w_s"]
    else:
        wq, ws = _quant_cols(p["w"])
    xq, sx = _rowquant_dyn(x)
    acc = jax.lax.dot_general(xq, wq, (((x.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    out = acc.astype(jnp.float32) * (sx * ws.astype(jnp.float32))
    return out.astype(dtype) + p["b"]


def qkv_fused_i8dyn(y: jax.Array, attn: Params, n_heads: int, dtype
                    ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """int8 variant of qkv_fused: one rowquant of y, one s8 MXU dot over
    the concatenated q/k/v int8 weights (per-column scales concatenate
    exactly — each output column keeps its own scale)."""
    if "w_s" in attn["q"]:
        wq = jnp.concatenate([attn[n]["w"] for n in ("q", "k", "v")],
                             axis=-1)
        ws = jnp.concatenate([attn[n]["w_s"] for n in ("q", "k", "v")])
    else:
        qs = [_quant_cols(attn[n]["w"]) for n in ("q", "k", "v")]
        wq = jnp.concatenate([q for q, _ in qs], axis=-1)
        ws = jnp.concatenate([s for _, s in qs])
    b = jnp.concatenate([attn["q"]["b"], attn["k"]["b"], attn["v"]["b"]])
    yq, sy = _rowquant_dyn(y)
    acc = jax.lax.dot_general(yq, wq, (((y.ndim - 1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * (sy * ws.astype(jnp.float32))
           ).astype(dtype) + b
    q, k, v = jnp.split(qkv, 3, axis=-1)
    return (split_heads(q, n_heads), split_heads_hm(k, n_heads),
            split_heads_hm(v, n_heads))


def split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """(B, T, d) -> (B, T, H, Dh) — query layout."""
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


def split_heads_hm(x: jax.Array, n_heads: int) -> jax.Array:
    """(B, S, d) -> (B, H, S, Dh) — head-major key/value (KV-cache) layout."""
    b, s, d = x.shape
    return x.reshape(b, s, n_heads, d // n_heads).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    b, t, h, dh = x.shape
    return x.reshape(b, t, h * dh)


def tok_embed(dec: Params, tokens: jax.Array, dtype) -> jax.Array:
    """Token-embedding lookup, handling the int8 weight-quantized table
    ({"tok_emb": int8 (V, d), "tok_emb_s": per-ROW f32 scale (V,)}).
    Gathering rows then scaling is elementwise-identical to gathering from
    the dequantized table (gather commutes with the per-row multiply)."""
    e = dec["tok_emb"][tokens]
    if "tok_emb_s" in dec:
        return e.astype(dtype) * dec["tok_emb_s"][tokens][..., None
                                                          ].astype(dtype)
    return e.astype(dtype)


# ---------------------------------------------------------------------------
# weight-only int8 quantization (serving mode)
# ---------------------------------------------------------------------------

def _quant_cols(w: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-output-column symmetric int8 over the reduction (in) axis:
    (..., in, out) -> (int8 values, f32 scales (..., out))."""
    wf = w.astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2) / 127.0, 1e-10)
    q = jnp.clip(jnp.round(wf / s[..., None, :]), -127, 127).astype(jnp.int8)
    return q, s


def quantize_weights_wq(params: Params, cfg: WhisperConfig) -> Params:
    """Weight-only int8 for the DECODER's per-step-read weights
    (cfg.weight_quant; serving/bf16 mode only — fp32 is the token-parity
    contract and stays unquantized).

    What gets quantized (everything the decode loop reads EVERY step):
      * self-attn q/k/v/o, cross-attn q/o, fc1/fc2 — per-output-column
        scales, which commute with the matmul exactly;
      * tok_emb — per-ROW scales (a row is both an embedding vector and a
        logit column, so per-row commutes with the tied-logit matmul).
    NOT quantized: cross-attn k/v projections (read once per transcription
    in precompute_cross_kv — no per-step traffic, pure accuracy cost),
    the encoder (compute-bound, weights read once per batch), biases,
    layer norms, pos_emb.

    Why (measured, v5e, benchmarks/wq_ab.py → DESIGN.md §28): the decode
    floor at medium/large is dominated by per-step weight reads (0.8-1.6
    GB bf16). The in-graph dequant (`deq`) fuses into the dot's operand
    read: d1024 L24 b16 slope 571 → 321 µs/step, d1280 L32 b8
    1178 → 635 — both land BELOW the bf16 weight-read floor, i.e. the
    weights genuinely stream from HBM as int8. Scale-on-output (`deqout`)
    and s8×s8 MXU dots (`i8dot`) measured slightly worse.

    Numerics: the effective weight is exactly int8→compute-dtype × scale
    (see _wq_dequant), so a run with quantized params is bit-identical to
    a run whose params were pre-materialized that way
    (tests/test_weight_quant.py); accuracy vs the UNquantized weights is
    the usual ≤0.4% per-element weight rounding (|w|/254 per column max).

    The reference has no quantization at all (fp32 throughout,
    whisper_tensor.mojo); this is a TPU-serving capability beyond parity.
    """
    if jnp.dtype(cfg.compute_dtype) == jnp.float32:
        raise ValueError("weight_quant is the serving-mode (bf16) feature; "
                         "fp32 is the token-parity contract")
    dec = params["decoder"]
    layers = dict(dec["layers"])

    def qlin(p):
        q, s = _quant_cols(p["w"])
        return {"w": q, "w_s": s, "b": p["b"]}

    layers["attn"] = {n: qlin(layers["attn"][n]) for n in ("q", "k", "v", "o")}
    layers["cross_attn"] = {**layers["cross_attn"],
                            "q": qlin(layers["cross_attn"]["q"]),
                            "o": qlin(layers["cross_attn"]["o"])}
    layers["fc1"] = qlin(layers["fc1"])
    layers["fc2"] = qlin(layers["fc2"])

    emb = dec["tok_emb"].astype(jnp.float32)
    s = jnp.maximum(jnp.max(jnp.abs(emb), axis=-1) / 127.0, 1e-10)
    q = jnp.clip(jnp.round(emb / s[:, None]), -127, 127).astype(jnp.int8)
    return {**params, "decoder": {**dec, "layers": layers,
                                  "tok_emb": q, "tok_emb_s": s}}


def dequantize_weights_wq(params: Params, dtype=jnp.bfloat16) -> Params:
    """Materialize the effective (compute-dtype) weights of a
    quantize_weights_wq tree — the numerics oracle for tests: running the
    quantized tree must be bit-identical to running this one."""
    dec = params["decoder"]
    layers = jax.tree.map(lambda x: x, dec["layers"])  # shallow-ish copy

    def dq(p):
        return {"w": _wq_dequant(p, dtype), "b": p["b"]}

    layers["attn"] = {n: dq(layers["attn"][n]) for n in ("q", "k", "v", "o")}
    layers["cross_attn"] = {**layers["cross_attn"],
                            "q": dq(layers["cross_attn"]["q"]),
                            "o": dq(layers["cross_attn"]["o"])}
    layers["fc1"] = dq(layers["fc1"])
    layers["fc2"] = dq(layers["fc2"])
    emb = (dec["tok_emb"].astype(dtype)
           * dec["tok_emb_s"][:, None].astype(dtype))
    out_dec = {k: v for k, v in dec.items() if k != "tok_emb_s"}
    return {**params, "decoder": {**out_dec, "layers": layers,
                                  "tok_emb": emb}}


# ---------------------------------------------------------------------------
# parameter initialization (for tests / benchmarks without real checkpoints)
# ---------------------------------------------------------------------------

def _init_linear(key, d_in, d_out, scale=0.02):
    kw, _ = jax.random.split(key)
    return {"w": jax.random.normal(kw, (d_in, d_out), jnp.float32) * scale,
            "b": jnp.zeros((d_out,), jnp.float32)}


def _init_ln(d):
    return {"g": jnp.ones((d,), jnp.float32), "b": jnp.zeros((d,), jnp.float32)}


def _stack(trees):
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def init_params(cfg: WhisperConfig, key: jax.Array) -> Params:
    """Random params with the exact shapes of a converted checkpoint."""
    keys = iter(jax.random.split(key, 64 + 16 * (cfg.n_audio_layers + cfg.n_text_layers)))
    d, ff = cfg.d_model, cfg.d_ff

    def attn_params():
        p = {n: _init_linear(next(keys), d, d) for n in ("q", "k", "v", "o")}
        p["k"]["b"] = jnp.zeros((d,), jnp.float32)  # k has no bias (HF contract)
        return p

    def enc_layer():
        return {"attn": attn_params(), "attn_ln": _init_ln(d),
                "fc1": _init_linear(next(keys), d, ff),
                "fc2": _init_linear(next(keys), ff, d),
                "mlp_ln": _init_ln(d)}

    def dec_layer():
        p = enc_layer()
        p["cross_attn"] = attn_params()
        p["cross_ln"] = _init_ln(d)
        return p

    sinusoid = sinusoidal_positions(cfg.n_audio_ctx, d)
    return {
        "encoder": {
            "conv1": {"w": jax.random.normal(next(keys), (d, cfg.n_mels, 3)) * 0.02,
                      "b": jnp.zeros((d,))},
            "conv2": {"w": jax.random.normal(next(keys), (d, d, 3)) * 0.02,
                      "b": jnp.zeros((d,))},
            "pos_emb": sinusoid,
            "layers": _stack([enc_layer() for _ in range(cfg.n_audio_layers)]),
            "ln_post": _init_ln(d),
        },
        "decoder": {
            "tok_emb": jax.random.normal(next(keys), (cfg.vocab_size, d)) * 0.02,
            "pos_emb": jax.random.normal(next(keys), (cfg.n_text_ctx, d)) * 0.02,
            "layers": _stack([dec_layer() for _ in range(cfg.n_text_layers)]),
            "ln": _init_ln(d),
        },
    }


def sinusoidal_positions(length: int, channels: int) -> jax.Array:
    """Whisper's fixed sinusoidal encoder positions (the reference loads
    these as a 1500x384 weight; we can also synthesize them)."""
    import numpy as np
    log_timescale = np.log(10_000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return jnp.asarray(np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1),
                       dtype=jnp.float32)


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------

def conv_stem(enc: Params, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """The encoder's two-conv stem: (B, n_mels, n_frames) -> (B, T, d),
    GeLU after each conv (reference whisper.mojo:71-89).

    Two formulations, WHISPER_TPU_CONV_STEM=conv|matmul (trace-time knob):
      * conv (default): lax.conv_general_dilated as XLA lowers it.
        Measured v5e bf16 b32: 1019 us — ~3x the compute floor but the
        faster option.
      * matmul: k3 convs as im2col matmuls (the mel-frontend STFT trick,
        DESIGN.md §11, applied to the stem; same products per output
        element, fp32 mode keeps HIGHEST). Measured 1760 us at b32 —
        a definitive NEGATIVE: unlike the single-channel STFT, the conv2
        im2col materializes a 3x-width (B, 1500, 1152) frames tensor
        (~110 MB bf16 at b32) whose HBM round trip swamps the MXU win.
        Kept as the documented A/B (the reference's load-time weight
        transpose, whisper_tensor.mojo:358-364, is the same idea on CPU
        where the dot stays in cache).
    """
    import os
    dtype = jnp.dtype(cfg.compute_dtype)
    x = mel.astype(dtype)
    if os.environ.get("WHISPER_TPU_CONV_STEM", "conv") == "matmul":
        def conv_mm(x_lc, p, stride, L_out):
            """x_lc: (B, L_in, C) length-major; returns (B, L_out, C_out)."""
            xp = jnp.pad(x_lc, ((0, 0), (1, 1), (0, 0)))
            frames = jnp.concatenate(
                [xp[:, s:s + stride * (L_out - 1) + 1:stride]
                 for s in range(3)], axis=-1)           # (B, L_out, 3*C)
            w = p["w"].astype(dtype)                    # (C_out, C_in, 3)
            w_r = jnp.transpose(w, (2, 1, 0)).reshape(-1, w.shape[0])
            return (jnp.dot(frames, w_r, precision=HIGHEST)
                    + p["b"].astype(dtype))

        x = jnp.transpose(x, (0, 2, 1))                 # (B, L, n_mels)
        L = x.shape[1]
        x = gelu(conv_mm(x, enc["conv1"], 1, L))
        return gelu(conv_mm(x, enc["conv2"], 2, L // 2))  # (B, T, d)

    def conv(x, p, stride):
        return jax.lax.conv_general_dilated(
            x, p["w"].astype(dtype), window_strides=(stride,),
            padding=[(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"),
            precision=HIGHEST,
        ) + p["b"].astype(dtype)[None, :, None]

    x = gelu(conv(x, enc["conv1"], 1))
    x = gelu(conv(x, enc["conv2"], 2))
    return jnp.transpose(x, (0, 2, 1))                  # (B, T, d)


def _encoder_tail_mode(cfg: WhisperConfig, B: int, T: int,
                       mlp_q: bool = False) -> str:
    """Dispatch for the fused encoder-block-tail kernel
    (ops/encoder_layer.py): 'pallas' | 'interpret' | 'off'.

    Auto policy mirrors the flash threshold (the tail kernel subsumes
    flash): engage on TPU whenever the materialized score matrix would be
    HBM-resident. WHISPER_TPU_FUSED_ENCODER=0|1 overrides (read at TRACE
    time — set before the first encoder call)."""
    import os

    from whisper_tpu.ops.attention import (
        _FLASH_MIN_SCORE_BYTES,
        default_backend,
    )
    backend = cfg.attn_backend or default_backend()
    env = os.environ.get("WHISPER_TPU_FUSED_ENCODER")
    if env == "0" or backend == "reference":
        return "off"
    if backend == "pallas_interpret":
        return "interpret"
    if env == "1" or backend == "pallas":
        return "pallas"
    # auto: same size gate as flash, on real TPU only; skip when no q-block
    # of the fused program fits v5e VMEM (auto_block_q calibration —
    # large-v3-turbo's d=1280 program measured 157.6 MB at bq=768)
    from whisper_tpu.ops.encoder_layer import tail_fits_vmem
    o_q = mlp_q and os.environ.get("WHISPER_TPU_ENC_I8O", "1") != "0"
    if (backend == "auto" and jax.default_backend() == "tpu"
            and B * cfg.n_heads * T * T * 4 >= _FLASH_MIN_SCORE_BYTES
            and tail_fits_vmem(T, T, cfg.n_heads, cfg.d_model,
                               4 * cfg.d_model,
                               jnp.dtype(cfg.compute_dtype).itemsize,
                               mlp_q, o_q)):
        return "pallas"
    return "off"


def _encoder_i8(cfg: WhisperConfig) -> bool:
    """cfg.encoder_quant with a trace-time env override (WHISPER_TPU_ENC_I8
    — same set-before-first-call caveat as the other trace-time knobs)."""
    import os
    env = os.environ.get("WHISPER_TPU_ENC_I8")
    if env is not None:
        return env == "1"
    return cfg.encoder_quant


def _encoder_i8k(cfg: WhisperConfig) -> bool:
    """cfg.encoder_mlp_quant (§32b in-kernel int8 MLP inside the fused
    tail) with a trace-time env override (WHISPER_TPU_ENC_I8K)."""
    import os
    env = os.environ.get("WHISPER_TPU_ENC_I8K")
    if env is not None:
        return env == "1"
    return cfg.encoder_mlp_quant


def _encoder_i8q(cfg: WhisperConfig) -> bool:
    """cfg.encoder_qkv_quant (§32b QKV addendum: XLA int8 QKV in front of
    the fused tail) with a trace-time env override (WHISPER_TPU_ENC_I8Q)."""
    import os
    env = os.environ.get("WHISPER_TPU_ENC_I8Q")
    if env is not None:
        return env == "1"
    return cfg.encoder_qkv_quant


def encoder_forward(params: Params, cfg: WhisperConfig,
                    mel: jax.Array) -> jax.Array:
    """(B, n_mels, n_frames) -> (B, n_audio_ctx, d_model).

    conv1 (k3 s1 p1) -> GeLU -> conv2 (k3 s2 p1) -> GeLU -> +pos ->
    N pre-norm blocks -> final LN (reference whisper.mojo:34-99).

    Block tail (attention + o-proj + LN2 + MLP) runs as ONE fused Pallas
    program per (batch, q-block) when eligible (ops/encoder_layer.py —
    the non-attention tail measured ~3 ms of the 5.3 ms tiny-b8 encoder
    as separate XLA fusions); LN1 + the fused-QKV projection stay in XLA
    (attention needs all positions' K/V first — a sequential barrier).

    int8 mode (cfg.encoder_quant, bf16 only, DESIGN.md §32): the four
    projections run as s8 x s8 MXU dots (linear_i8dyn) and the Pallas
    tail is bypassed — the projections must be visible to XLA."""
    enc = params["encoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    x = conv_stem(enc, cfg, mel) + enc["pos_emb"].astype(dtype)

    enc_i8 = _encoder_i8(cfg) and dtype != jnp.float32
    enc_i8k = (_encoder_i8k(cfg) and dtype != jnp.float32 and not enc_i8)
    tail = "off" if enc_i8 else _encoder_tail_mode(cfg, x.shape[0],
                                                   x.shape[1], enc_i8k)
    enc_i8k = enc_i8k and tail != "off"   # §32b lives inside the kernel

    layers = enc["layers"]
    if enc_i8k:
        # Per-output-column int8 for the stacked fc1/fc2 (leading layer
        # axis; _quant_cols reduces axis=-2). One weight read per encoder
        # call (~1 ms at large) — folded into weight prep if it matters.
        f1q, f1s = _quant_cols(layers["fc1"]["w"])
        f2q, f2s = _quant_cols(layers["fc2"]["w"])
        layers = (layers, {"f1q": f1q, "f1s": f1s,
                           "f2q": f2q, "f2s": f2s})

    def block(h, lp):
        mlpq = None
        if isinstance(lp, tuple):
            lp, mlpq = lp
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        if enc_i8:
            q, k, v = qkv_fused_i8dyn(y, lp["attn"], cfg.n_heads, dtype)
            a = merge_heads(multi_head_attention(q, k, v,
                                                 backend=cfg.attn_backend))
            h = r + linear_i8dyn(a, lp["attn"]["o"], dtype)
            r = h
            y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"],
                           cfg.ln_eps)
            y = linear_i8dyn(gelu(linear_i8dyn(y, lp["fc1"], dtype)),
                             lp["fc2"], dtype)
            return r + y, None
        if mlpq is not None and _encoder_i8q(cfg):
            # §32b QKV addendum: XLA-level int8 QKV in FRONT of the fused
            # tail — §32's negative conflated XLA act-quant with LOSING
            # the tail kernel; this hybrid isolates the QKV lever (the
            # last bf16 encoder matmul, ~25% of its FLOPs). Default-on at
            # d>=1024 via apply_serving_quant (e2e +0.9..+2.5%).
            q, k, v = qkv_fused_i8dyn(y, lp["attn"], cfg.n_heads, dtype)
        else:
            q, k, v = qkv_fused(y, lp["attn"], cfg.n_heads)
        if tail != "off":
            from whisper_tpu.ops.encoder_layer import (
                encoder_block_tail,
                pack_tail_misc,
                pad_tail_weights,
            )
            wo = pad_tail_weights(lp["attn"]["o"]["w"], cfg.n_heads, dtype)
            if mlpq is not None:
                fc1_w, fc2_w = mlpq["f1q"], mlpq["f2q"]
                wo_s = None
                if os.environ.get("WHISPER_TPU_ENC_I8O", "1") != "0":
                    # int8 o-projection rides the MLP quant (per-column
                    # quant of the PADDED wo — zero pad rows never set a
                    # scale). Measured +2.4-2.7% encoder phase at
                    # medium/turbo (DESIGN §32b addendum); =0 opts out.
                    wo, wo_s = _quant_cols(wo)
                misc = pack_tail_misc(lp, mlpq["f1s"], mlpq["f2s"], wo_s)
            else:
                fc1_w = lp["fc1"]["w"].astype(dtype)
                fc2_w = lp["fc2"]["w"].astype(dtype)
                misc = pack_tail_misc(lp)
            h = encoder_block_tail(
                q, k, v, h, wo,
                fc1_w, fc2_w, misc, eps=cfg.ln_eps,
                interpret=tail == "interpret")
            return h, None
        a = merge_heads(multi_head_attention(q, k, v,
                                             backend=cfg.attn_backend))
        h = r + linear(a, lp["attn"]["o"])
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        y = linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return r + y, None

    x, _ = jax.lax.scan(block, x, layers,
                        unroll=cfg.n_audio_layers <= 8)
    return layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"], cfg.ln_eps)


# ---------------------------------------------------------------------------
# decoder + KV cache
# ---------------------------------------------------------------------------

def quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-vector symmetric int8 quantization: (..., D) -> (int8 values,
    fp32 scale (..., 1)). Halves KV-cache HBM traffic during decode (the
    pallas_guide quantized-cache recipe, applied at the XLA level so the
    dequant multiply fuses into the attention matmul)."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-10)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127
                 ).astype(jnp.int8)
    return q, s


def dequantize_kv(q: jax.Array, s: jax.Array, dtype) -> jax.Array:
    return (q.astype(jnp.float32) * s).astype(dtype)


def _cache_attention(q: jax.Array, entry: dict, kv_len, *,
                     causal: bool, q_offset, cfg: WhisperConfig,
                     dtype) -> jax.Array:
    """Attention over a (possibly int8-quantized) cache slice. The
    quantized route keeps int8 all the way into the Pallas decode kernel
    (dequant in VMEM); the plain route dispatches normally."""
    if "k_s" in entry:
        return multi_head_attention_quant(
            q, entry["k"], entry["k_s"], entry["v"], entry["v_s"], kv_len,
            causal=causal, q_offset=q_offset, backend=cfg.attn_backend)
    return multi_head_attention(
        q, entry["k"].astype(dtype), entry["v"].astype(dtype), kv_len,
        causal=causal, q_offset=q_offset, backend=cfg.attn_backend)


def init_kv_cache(cfg: WhisperConfig, batch: int,
                  dtype=jnp.float32,
                  s_max: int | None = None) -> dict[str, jax.Array]:
    """Fixed-shape self-attention cache, head-major (replaces reference
    LayerCache's preallocated 448x384 buffers + current_len cursor,
    layers.mojo:14-52). Layout (L, B, H, S_max, Dh): per-head rows are
    contiguous, which is what the Pallas decode kernel streams from HBM.

    s_max (default cfg.n_text_ctx) right-sizes the slot count: the decode
    step's self-attention reads EVERY allocated slot each step (masked
    slots are read-then-discarded — XLA cannot skip them), so a greedy
    call that can only ever reach prompt+1+max_new positions should not
    pay for 448. At the bench workload (93 live slots) this cuts the
    per-step self-cache read 88 -> 25 MB at b32. Numerics are unchanged:
    masked slots contribute exp(-inf)=0.0 exactly, so sums are identical.

    With cfg.kv_cache_quant the values are int8 with per-vector fp32 scales
    ({"k","k_s","v","v_s"}). cfg.self_kv_quant (serving/bf16 mode only —
    fp32 token-parity keeps full-precision caches) allocates the same
    quantized layout but the loop reads it scale-COMMUTED in
    decoder_step_ip (no dequantized tensor, DESIGN.md §35) instead of via
    the dequant route."""
    shape = (cfg.n_text_layers, batch, cfg.n_heads,
             s_max or cfg.n_text_ctx, cfg.head_dim)
    if cfg.kv_cache_quant or (cfg.self_kv_quant
                              and jnp.dtype(dtype) != jnp.float32):
        sshape = shape[:-1] + (1,)
        return {"k": jnp.zeros(shape, jnp.int8),
                "k_s": jnp.full(sshape, 1e-10, jnp.float32),
                "v": jnp.zeros(shape, jnp.int8),
                "v_s": jnp.full(sshape, 1e-10, jnp.float32)}
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype)}


def precompute_cross_kv(params: Params, cfg: WhisperConfig,
                        enc_out: jax.Array) -> dict[str, jax.Array]:
    """Project encoder output into every decoder layer's cross-attn K/V once
    (replaces the has_cross compute-once guard, reference layers.mojo:148-157).

    Returns {"k","v"} (L, B, H, n_audio_ctx, Dh) head-major — int8 +
    per-vector scales when cfg.kv_cache_quant or cfg.cross_kv_quant (the
    cross cache is the dominant decode-loop read: every step touches all
    1500 positions)."""
    def proj(lp):
        k = split_heads_hm(linear(enc_out, lp["cross_attn"]["k"]), cfg.n_heads)
        v = split_heads_hm(linear(enc_out, lp["cross_attn"]["v"]), cfg.n_heads)
        return k, v

    ks, vs = jax.vmap(proj)(params["decoder"]["layers"])
    if cfg.kv_cache_quant or cfg.cross_kv_quant:
        kq, ks_ = quantize_kv(ks)
        vq, vs_ = quantize_kv(vs)
        return {"k": kq, "k_s": ks_, "v": vq, "v_s": vs_}
    return {"k": ks, "v": vs}


def decoder_forward(params: Params, cfg: WhisperConfig,
                    tokens: jax.Array, pos_offset: jax.Array,
                    kv_cache: dict[str, jax.Array],
                    cross_kv: dict[str, jax.Array],
                    ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One decoder pass over T new tokens with cache append.

    Args:
      tokens: (B, T) int32 — T is static (prompt length for prefill, 1 for
        incremental steps; reference whisper.mojo:195-197 and :212-218).
      pos_offset: scalar int — absolute position of tokens[:, 0].
      kv_cache: self-attn cache from init_kv_cache; new K/V are written at
        positions [pos_offset, pos_offset+T).
      cross_kv: from precompute_cross_kv.

    Returns:
      logits (B, T, vocab) fp32, updated kv_cache.
    """
    dec = params["decoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    B, T = tokens.shape

    h = tok_embed(dec, tokens, dtype)
    pos = jax.lax.dynamic_slice_in_dim(dec["pos_emb"], pos_offset, T)
    h = h + pos.astype(dtype)

    # self-attn masking is expressed as (kv_len, causal, q_offset): key j
    # visible to query i iff j <= pos_offset + i (cache-relative causal mask,
    # reference layers.mojo:213,311-317); unwritten cache slots fall outside
    # kv_len. The kernels skip whole masked blocks instead of computing them.
    kv_len = pos_offset + T

    def append(cache_l: dict, name: str, new: jax.Array) -> dict:
        """Write T new rows at pos_offset; quantizing first when the cache
        is int8 (new rows get their own per-vector scales)."""
        if name + "_s" in cache_l:
            q, s = quantize_kv(new)
            return {**cache_l,
                    name: jax.lax.dynamic_update_slice(
                        cache_l[name], q, (0, 0, pos_offset, 0)),
                    name + "_s": jax.lax.dynamic_update_slice(
                        cache_l[name + "_s"], s, (0, 0, pos_offset, 0))}
        return {**cache_l,
                name: jax.lax.dynamic_update_slice(
                    cache_l[name], new.astype(cache_l[name].dtype),
                    (0, 0, pos_offset, 0))}

    def block(h, xs):
        lp, cache_l, cross_l = xs
        # --- self attention with cache append ---
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
        cache_l = append(cache_l, "k", k_new)
        cache_l = append(cache_l, "v", v_new)
        a = merge_heads(_cache_attention(
            q, cache_l, kv_len, causal=True, q_offset=pos_offset,
            cfg=cfg, dtype=dtype))
        h = r + linear(a, lp["attn"]["o"])
        # --- cross attention over precomputed encoder K/V ---
        r = h
        y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"], cfg.ln_eps)
        q = split_heads(linear(y, lp["cross_attn"]["q"]), cfg.n_heads)
        a = merge_heads(_cache_attention(
            q, cross_l, None, causal=False, q_offset=0,
            cfg=cfg, dtype=dtype))
        h = r + linear(a, lp["cross_attn"]["o"])
        # --- MLP ---
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        y = linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return r + y, cache_l

    h, new_cache = jax.lax.scan(
        block, h, (dec["layers"], kv_cache, cross_kv),
        unroll=cfg.n_text_layers <= 8)

    return final_logits(params, cfg, h), new_cache


def final_logits(params: Params, cfg: WhisperConfig, h: jax.Array
                 ) -> jax.Array:
    """Final LayerNorm + tied-embedding logit projection, (B, T, d) ->
    (B, T, vocab) fp32 — shared by decoder_forward, decoder_step_ragged and
    the fused decode step (ops/decoder_step.py).

    The tied-embedding matmul decides the argmax (reference keeps this
    matmul deliberately simple too, whisper.mojo:162-166). fp32 mode runs
    it at HIGHEST precision — the token-parity contract. bf16 mode streams
    the embedding in bf16 with fp32 accumulation: the logit matmul is the
    second-largest per-step HBM read (80 MB fp32 vs 40 MB bf16) and the
    whole point of the bf16 path is bandwidth."""
    dec = params["decoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    h = layer_norm(h, dec["ln"]["g"], dec["ln"]["b"], cfg.ln_eps)
    if dtype == jnp.float32:
        logits = jnp.dot(h.astype(jnp.float32),
                         dec["tok_emb"].T.astype(jnp.float32),
                         precision=HIGHEST)
    elif "tok_emb_s" in dec:
        # weight-quantized table: per-ROW scales are per-output-COLUMN of
        # the tied-logit matmul, the exact-commuting axis; the in-graph
        # dequant fuses into the dot's operand read (DESIGN.md §28) so the
        # per-step logit read is the int8 bytes (~26 MB at medium vs 106)
        w = (dec["tok_emb"].astype(dtype)
             * dec["tok_emb_s"][:, None].astype(dtype))
        logits = jnp.dot(h, w.T, preferred_element_type=jnp.float32)
    else:
        logits = jnp.dot(h, dec["tok_emb"].T.astype(dtype),
                         preferred_element_type=jnp.float32)
    # Under tensor parallelism the embedding rows are zero-padded to a
    # tp-divisible count (parallel/mesh.py shard_params) so the logit
    # matmul genuinely splits over chips; the pad logits are exact zeros
    # (h @ 0, tied embedding has no bias) — slice back to the true vocab
    # so every consumer sees (B, T, vocab_size).
    if logits.shape[-1] != cfg.vocab_size:
        logits = jax.lax.slice_in_dim(logits, 0, cfg.vocab_size, axis=-1)
    return logits


def transpose_self_cache(kv_cache: dict[str, jax.Array]) -> dict[str, jax.Array]:
    """(L, B, H, S, Dh) -> (L, B, H, Dh, S): the decode-LOOP cache layout
    (see decoder_step_t). Done once per transcription after prefill."""
    return {"k": kv_cache["k"].transpose(0, 1, 2, 4, 3),
            "v": kv_cache["v"].transpose(0, 1, 2, 4, 3)}


def decoder_step_t(params: Params, cfg: WhisperConfig,
                   tokens1: jax.Array, pos_offset: jax.Array,
                   cache_t: dict[str, jax.Array],
                   cross_kv: dict[str, jax.Array],
                   ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One T==1 decode step over the TRANSPOSED self-cache (L, B, H, Dh, S).

    Why a second layout exists (measured, v5e, benchmarks/loop_anatomy.py +
    compiled-HLO audit r2): with the standard (.., S, Dh) cache carried
    through the decode loop, XLA's layout assignment re-lays the carry
    S-minor for the q_len==1 attention reduce and then lowers every
    per-step cache append as a full-array pad+select rewrite — 2x27.6 MB
    per step at tiny b8 (~250 us, half the step). Storing the loop cache
    (.., Dh, S) makes the attention-preferred layout the DEFAULT layout:
    the append is an in-place minor-dim column write and no relayout
    exists. The loop never returns the cache (greedy/beam return tokens),
    so the transposed layout stays loop-local.

    Numerics: score/value contractions consume the same operand values as
    mha_reference (a transpose changes no products). fp32 mode keeps the
    fp32/HIGHEST token-parity contract; bf16 mode feeds the dots bf16 with
    fp32 accumulation — bf16 x bf16 products are exact in fp32 (8-bit
    mantissas), so this differs from the fp32-upcast path only in
    accumulation grouping. Softmax stays fp32.

    Args:
      tokens1: (B, 1) int32.
      pos_offset: scalar int32 — absolute position (cache write index).
      cache_t: {"k","v"} (L, B, H, Dh, S), unquantized.
      cross_kv: standard precompute_cross_kv output; may be int8-quantized
        (cfg.cross_kv_quant) — see att_cross.
    Returns:
      logits (B, 1, vocab) fp32, updated cache_t.
    """
    assert "k_s" not in cache_t, "decoder_step_t is unquantized-only"
    dec = params["decoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    f32 = jnp.float32
    fp32_mode = dtype == f32
    prec = HIGHEST if fp32_mode else None
    S = cache_t["k"].shape[-1]
    D = cfg.head_dim

    h = tok_embed(dec, tokens1, dtype)             # (B, 1, d)
    h = h + dec["pos_emb"][pos_offset][None, None, :].astype(dtype)
    kv_len = pos_offset + 1
    key_mask = (jnp.arange(S) < kv_len)[None, None, None, :]

    def _att(q, k, v, k_eq: str, v_eq: str, mask) -> jax.Array:
        """Shared dot policy. fp32 mode: upcast + HIGHEST + scale-before,
        byte-matching mha_reference. bf16 mode: bf16 operands with fp32
        accumulation (products exact) and the scale applied to the fp32
        scores (strictly closer to the fp32 reference than scaling in
        bf16). Softmax always fp32."""
        if fp32_mode:
            qd = q.astype(f32) * (D ** -0.5)
            s = jnp.einsum(k_eq, qd, k.astype(f32), precision=prec)
        else:
            s = jnp.einsum(k_eq, q, k, preferred_element_type=f32
                           ) * (D ** -0.5)
        if mask is not None:
            s = jnp.where(mask, s, jnp.finfo(f32).min)
        p = jax.nn.softmax(s, axis=-1)
        if fp32_mode:
            out = jnp.einsum(v_eq, p, v.astype(f32), precision=prec)
        else:
            out = jnp.einsum(v_eq, p.astype(dtype), v,
                             preferred_element_type=f32)
        return out.astype(dtype)

    def att(q, k, v):
        """Self attention over the transposed cache; at q_len==1 the causal
        mask degenerates to the length mask."""
        return _att(q, k, v, "bthd,bhds->bhts", "bhts,bhds->bthd", key_mask)

    def att_cross(q, cross_l):
        """Cross attention (all S_cross positions valid). With an int8
        cross cache (cfg.cross_kv_quant), the TPU path streams the int8
        tiles straight through the Pallas decode kernel and dequantizes in
        VMEM — the half-bandwidth read is the point (~74 MB of ~115 MB
        per-step HBM at tiny b8 is cross K/V); elsewhere the cache is
        dequantized into the reference formulation."""
        if "k_s" in cross_l:
            mode = _q8_cross_mode()
            if not fp32_mode and mode == "commute":
                return _att_cross_q8(q.astype(dtype), cross_l, D, dtype)
            from whisper_tpu.ops.attention import default_backend
            backend = cfg.attn_backend or default_backend()
            if mode != "deq" and (
                    (backend in ("auto", "pallas")
                     and jax.default_backend() == "tpu")
                    or backend == "pallas_interpret"):
                from whisper_tpu.ops.decode_attention import (
                    decode_attention_q8_bh,
                )
                return decode_attention_q8_bh(
                    q.astype(dtype), cross_l["k"], cross_l["k_s"],
                    cross_l["v"], cross_l["v_s"], None,
                    interpret=backend == "pallas_interpret").astype(dtype)
            k = dequantize_kv(cross_l["k"], cross_l["k_s"], dtype)
            v = dequantize_kv(cross_l["v"], cross_l["v_s"], dtype)
            return _att(q, k, v, "bthd,bhsd->bhts", "bhts,bhsd->bthd", None)
        return _att(q, cross_l["k"].astype(dtype), cross_l["v"].astype(dtype),
                    "bthd,bhsd->bhts", "bhts,bhsd->bthd", None)

    def block(h, xs):
        lp, cache_l, cross_l = xs
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
        # append: (B, H, 1, D) -> a (B, H, D, 1) column at S-index pos
        kc = jax.lax.dynamic_update_slice(
            cache_l["k"], k_new.transpose(0, 1, 3, 2).astype(cache_l["k"].dtype),
            (0, 0, 0, pos_offset))
        vc = jax.lax.dynamic_update_slice(
            cache_l["v"], v_new.transpose(0, 1, 3, 2).astype(cache_l["v"].dtype),
            (0, 0, 0, pos_offset))
        h = r + linear(merge_heads(att(q, kc.astype(dtype),
                                       vc.astype(dtype))), lp["attn"]["o"])
        r = h
        y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"], cfg.ln_eps)
        q = split_heads(linear(y, lp["cross_attn"]["q"]), cfg.n_heads)
        h = r + linear(merge_heads(att_cross(q, cross_l)),
                       lp["cross_attn"]["o"])
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return h, {"k": kc, "v": vc}

    h, new_cache = jax.lax.scan(
        block, h, (dec["layers"], cache_t, cross_kv),
        unroll=cfg.n_text_layers <= 8)

    return final_logits(params, cfg, h), new_cache


def _self_attention_extra(q, k_cache, v_cache, k_new, v_new, strict_mask,
                          D: int, dtype, q8_cross: bool = False,
                          mxu_t: Optional[int] = None) -> jax.Array:
    """q_len==1 self-attention over a READ-ONLY cache plus the current
    token's explicit contribution: softmax over [cache rows where
    strict_mask] ∪ {self}, computed as a two-part online softmax (shared
    max, summed denominators). Identical products to appending k_new/v_new
    at the query's own position first; differs only in accumulation
    grouping. Shared by decoder_step_ip (scalar pos mask) and
    decoder_step_ragged's in-place path (per-row pos mask).

    q: (B,1,H,D); k_cache/v_cache: (B,H,S,D); k_new/v_new: (B,H,1,D);
    strict_mask broadcastable to (B,H,1,S). fp32 dtype keeps the
    HIGHEST-precision scale-before-dot policy of mha_reference.

    bf16 mode runs the two big contractions at a TILED query length
    (identical rows, slice row 0): at T==1 XLA lowers the einsums as VPU
    convert+multiply+reduce fusions — measured COMPUTE-bound at ~160
    µs/layer for the b32 cross attention vs a 90 µs read floor
    (DESIGN.md §22) — while T>=8 flips the lowering to an MXU dot, where
    the contraction is effectively free and only the HBM reads remain.
    WHISPER_TPU_MXU_T overrides the tile (0 = the straight T==1 form)."""
    f32 = jnp.float32
    fp32_mode = jnp.dtype(dtype) == f32
    prec = HIGHEST if fp32_mode else None
    B, _, H, _ = q.shape

    if fp32_mode:
        s_c = jnp.einsum("bthd,bhsd->bhts", q.astype(f32) * (D ** -0.5),
                         k_cache.astype(f32), precision=prec)
        s_s = jnp.einsum("bthd,bhtd->bht", q.astype(f32) * (D ** -0.5),
                         k_new.astype(f32), precision=prec)[..., None]
    else:
        t8 = mxu_t if mxu_t is not None else \
            _mxu_query_tile(H * q.shape[-1], q8_cross)
        if t8 > 1:
            q8 = jnp.broadcast_to(q, (B, t8, H, q.shape[-1]))
            s_c = jnp.einsum("bthd,bhsd->bhts", q8, k_cache,
                             preferred_element_type=f32
                             )[:, :, :1] * (D ** -0.5)
        else:
            s_c = jnp.einsum("bthd,bhsd->bhts", q, k_cache,
                             preferred_element_type=f32) * (D ** -0.5)
        s_s = jnp.einsum("bthd,bhtd->bht", q, k_new,
                         preferred_element_type=f32)[..., None] \
            * (D ** -0.5)
    s_c = jnp.where(strict_mask, s_c, jnp.finfo(f32).min)
    m = jnp.maximum(jnp.max(s_c, axis=-1, keepdims=True), s_s)
    e_c = jnp.exp(s_c - m)
    e_s = jnp.exp(s_s - m)
    denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_s
    p = e_c / denom                                       # (B,H,1,S) f32
    if fp32_mode:
        o = jnp.einsum("bhts,bhsd->bthd", p, v_cache.astype(f32),
                       precision=prec)
    else:
        t8 = mxu_t if mxu_t is not None else \
            _mxu_query_tile(H * q.shape[-1], q8_cross)
        if t8 > 1:
            p8 = jnp.broadcast_to(p.astype(dtype),
                                  p.shape[:2] + (t8, p.shape[-1]))
            o = jnp.einsum("bhts,bhsd->bthd", p8, v_cache,
                           preferred_element_type=f32)[:, :1]
        else:
            o = jnp.einsum("bhts,bhsd->bthd", p.astype(dtype), v_cache,
                           preferred_element_type=f32)
    o = o + ((e_s / denom).transpose(0, 3, 1, 2)
             * v_new.transpose(0, 2, 1, 3).astype(f32))
    return o.astype(jnp.dtype(dtype))


def _self_attention_extra_q8(q, k8, k_s, v8, v_s, k_new, v_new, strict_mask,
                             D: int, dtype, q8_cross: bool = False,
                             mxu_t: Optional[int] = None) -> jax.Array:
    """_self_attention_extra over a scale-commuted int8 self cache — the
    §29 cross-KV commute applied to the decode loop's other cache read
    (DESIGN.md §35, cfg.self_kv_quant). Same two-part online softmax; the
    per-vector scales never materialize a dequantized cache:

        score[b,h,t,s] = (q · k8[s]) * k_s[s]       (scale on the score axis)
        out[b,h,t,d]   = Σ_s (p[s] * v_s[s]) * v8[s,d]

    so the int8→bf16 converts fuse into the MXU/VPU operand reads exactly
    as in _att_cross_q8. The current token's k_new/v_new stay bf16 (they
    are this step's activations, not cache reads); its row is written
    int8 AFTER the layer scan by the quantizing append in decoder_step_ip
    — later steps read the quantized row, so products match the
    kv_cache_quant dequant route, not the bf16 cache. bf16 serving mode
    only (fp32 parity keeps full-precision caches).

    q: (B,1,H,D); k8/v8: int8 (B,H,S,D); k_s/v_s: fp32 (B,H,S,1);
    k_new/v_new: (B,H,1,D); strict_mask broadcastable to (B,H,1,S)."""
    f32 = jnp.float32
    B, _, H, _ = q.shape
    ks = k_s[:, :, None, :, 0]                            # (B,H,1,S)
    vs = v_s[:, :, None, :, 0]
    t8 = mxu_t if mxu_t is not None else \
        _mxu_query_tile(H * q.shape[-1], q8_cross)
    if t8 > 1:
        qq = jnp.broadcast_to(q, (B, t8) + q.shape[2:])
        s_c = jnp.einsum("bthd,bhsd->bhts", qq, k8.astype(dtype),
                         preferred_element_type=f32)[:, :, :1]
    else:
        s_c = jnp.einsum("bthd,bhsd->bhts", q, k8.astype(dtype),
                         preferred_element_type=f32)
    s_c = s_c * (ks * (D ** -0.5))
    s_s = jnp.einsum("bthd,bhtd->bht", q, k_new,
                     preferred_element_type=f32)[..., None] * (D ** -0.5)
    s_c = jnp.where(strict_mask, s_c, jnp.finfo(f32).min)
    m = jnp.maximum(jnp.max(s_c, axis=-1, keepdims=True), s_s)
    e_c = jnp.exp(s_c - m)
    e_s = jnp.exp(s_s - m)
    denom = jnp.sum(e_c, axis=-1, keepdims=True) + e_s
    p = e_c / denom                                       # (B,H,1,S) f32
    pv = (p * vs).astype(dtype)
    if t8 > 1:
        pv8 = jnp.broadcast_to(pv, pv.shape[:2] + (t8, pv.shape[-1]))
        o = jnp.einsum("bhts,bhsd->bthd", pv8, v8.astype(dtype),
                       preferred_element_type=f32)[:, :1]
    else:
        o = jnp.einsum("bhts,bhsd->bthd", pv, v8.astype(dtype),
                       preferred_element_type=f32)
    o = o + ((e_s / denom).transpose(0, 3, 1, 2)
             * v_new.transpose(0, 2, 1, 3).astype(f32))
    return o.astype(jnp.dtype(dtype))


def _mxu_query_tile(d_model: int, q8_cross: bool = False) -> int:
    """Query-tile width for the T==1 decode contractions (bf16 only);
    trace-time env knob WHISPER_TPU_MXU_T overrides. Width-aware default
    (r3 family sweep, DESIGN.md §22/§27): tiling to T=8 flips XLA's
    lowering from VPU convert+mul+reduce to an MXU dot. At tiny/base the
    8x-wide score/probability intermediates cost more HBM than the VPU
    time saved (tiny b32 751 -> 1171 µs/step; base b32 6301 -> 6022
    RTFx), but the VPU term scales with L*H*S and from d_model=768 up
    the tiling WINS big: small b32 1368 -> 1865 RTFx, medium b16 slope
    8971 -> 6147 µs/step (460 -> 612 RTFx), large-v2 b8 234 -> 301.

    q8_cross: the loop reads int8 cross-KV via the scale-commuted route —
    there the T==1 VPU lowering ALSO carries the int8->bf16 convert, and
    the tiling trade moves: it WINS at d=384 (tiny b32 repeat pairs
    15,333/15,347 -> 15,527/15,648 RTFx) but LOSES at d=512 (base b32
    wq+cq 7,470 MXU0 vs 6,873 MXU8) — DESIGN.md §29b. The default under
    q8_cross therefore engages at 384 and stays off at 512 (widths >=768
    tile regardless)."""
    import os
    default = 8 if (d_model >= 768 or (q8_cross and d_model < 512)) else 0
    return int(os.environ.get("WHISPER_TPU_MXU_T", str(default)))


def _q8_cross_mode() -> str:
    """Formulation for int8 cross-attention inside the decode loop (bf16
    serving mode; trace-time env knob WHISPER_TPU_Q8_CROSS, same
    set-before-first-call caveat as _loop_step_mode):

      * 'commute' (default) — scale-commuted XLA dots (_att_cross_q8).
      * 'kernel' — the per-(batch, head) Pallas int8 decode kernel
        (decode_attention_q8_bh); launch-overhead-bound at Whisper sizes
        (DESIGN.md §16) but kept for A/B and giant-context shapes.
      * 'deq' — materialized dequant then the bf16 einsum path (the §16
        pathology; A/B instrumentation only)."""
    import os
    return os.environ.get("WHISPER_TPU_Q8_CROSS", "commute")


def _att_cross_q8(q: jax.Array, cross_l: dict[str, jax.Array],
                  D: int, dtype,
                  mxu_t: Optional[int] = None) -> jax.Array:
    """Scale-commuted int8 cross-attention for the T==1 decode step —
    no dequantized K/V tensor ever exists.

    DESIGN.md §16 measured two int8-cross routes as definitive e2e
    negatives: the per-(b,h) Pallas kernel (launch-bound at S=1500) and
    the XLA dequant route (materializes the full bf16 cache per step).
    Both moved dequantized bytes. This third formulation commutes the
    per-vector scales out of both contractions instead:

        score[b,h,t,s] = (q · k_int8[s]) * k_s[s]      (S not contracted)
        out[b,h,t,d]   = Σ_s (p[s] * v_s[s]) * v_int8[s,d]

    so the int8→bf16 converts are pure operand-read fusions into the MXU
    dots — the same fusion benchmarks/wq_ab.py measured streaming int8
    weights below the bf16 weight-read floor (DESIGN.md §28) — and the
    scale multiplies touch only (B,H,1,S) score/probability tensors.
    Cross-KV is the dominant decode read (e.g. ~2.4 GB/step of medium
    b16's ~3 GB); this halves it.

    Numerics: identical products to the dequantized form up to where the
    scale multiply lands (fp32 scores vs bf16 operands) — each output
    differs from the deq route only by bf16 rounding of p*v_s vs v*v_s.

    q: (B,1,H,D) compute dtype; cross_l: int8 {"k","v"} (B,H,S,D) with
    fp32 per-vector scales {"k_s","v_s"} (B,H,S,1).
    """
    f32 = jnp.float32
    B, _, H, _ = q.shape
    k, v = cross_l["k"], cross_l["v"]
    ks = cross_l["k_s"][:, :, None, :, 0]                  # (B,H,1,S)
    vs = cross_l["v_s"][:, :, None, :, 0]
    t8 = mxu_t if mxu_t is not None else \
        _mxu_query_tile(H * D, q8_cross=True)
    if t8 > 1:
        qq = jnp.broadcast_to(q, (B, t8) + q.shape[2:])
        s = jnp.einsum("bthd,bhsd->bhts", qq, k.astype(dtype),
                       preferred_element_type=f32)[:, :, :1]
    else:
        s = jnp.einsum("bthd,bhsd->bhts", q, k.astype(dtype),
                       preferred_element_type=f32)
    s = s * (ks * (D ** -0.5))
    p = jax.nn.softmax(s, axis=-1)
    pv = (p * vs).astype(dtype)                            # (B,H,1,S)
    if t8 > 1:
        pv = jnp.broadcast_to(pv, pv.shape[:2] + (t8, pv.shape[-1]))
        o = jnp.einsum("bhts,bhsd->bthd", pv, v.astype(dtype),
                       preferred_element_type=f32)[:, :1]
    else:
        o = jnp.einsum("bhts,bhsd->bthd", pv, v.astype(dtype),
                       preferred_element_type=f32)
    return o.astype(dtype)


def decoder_step_ip(params: Params, cfg: WhisperConfig,
                    tokens1: jax.Array, pos_offset: jax.Array,
                    kv_cache: dict[str, jax.Array],
                    cross_kv: dict[str, jax.Array],
                    mxu_t: Optional[int] = None,
                    ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One T==1 decode step with a READ-ONLY standard-layout cache and a
    single in-place batched append — the serving-mode loop step.

    Why (measured, v5e tiny bf16 b32, benchmarks/loop_bisect.py r3): every
    XLA spelling of the per-layer cache append — scan-stacked DUS
    (decoder_step_t: 1370 µs/step), flat-buffer DUS (1861), transposed
    lane-column writes — lowers as a full-cache data movement, ~780 µs of
    the step. This step never writes the cache inside the layer scan:

      * self-attention reads the cache STRICTLY below `pos` and folds the
        current token's contribution in as an explicit extra softmax term
        (s_self = q·k_new): m = max(max(s_cache), s_self), denominators
        summed over both parts. Identical products to the append-first
        formulation — the current token's row would hold exactly k_new —
        differing only in fp32 accumulation grouping (the reason bf16
        serving defaults here while fp32 token-parity mode keeps
        decoder_step_t's byte-stable path; argmax agreement verified).
      * all L layers' new K/V rows are written by ONE aliased Pallas call
        (ops/cache_append.py) after the scan — ~1.5 MB of DMA instead of
        the 176 MB rewrite. Measured: 1370 → 773 µs/step at b32.

    The cache stays in the init_kv_cache layout (L, B, H, S, D) — no
    transpose_self_cache pass and beam/continuous machinery see the
    standard layout. int8 cross_kv is supported (same policy as
    decoder_step_t.att_cross); a quantized SELF cache ({"k_s","v_s"},
    cfg.self_kv_quant) is read scale-commuted (_self_attention_extra_q8,
    DESIGN.md §35) and appended int8 — bf16 serving mode only. Reference
    counterpart: the in-place append cursor into preallocated buffers,
    layers.mojo:14-52 — this is that idea expressed against XLA's
    functional semantics.
    """
    dec = params["decoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    f32 = jnp.float32
    fp32_mode = dtype == f32
    q8_self = "k_s" in kv_cache
    assert not (q8_self and fp32_mode), \
        "quantized self cache is serving (bf16) mode only in decoder_step_ip"
    prec = HIGHEST if fp32_mode else None
    S = kv_cache["k"].shape[-2]
    D = cfg.head_dim

    h = tok_embed(dec, tokens1, dtype)             # (B, 1, d)
    h = h + dec["pos_emb"][pos_offset][None, None, :].astype(dtype)
    strict_mask = (jnp.arange(S) < pos_offset)[None, None, None, :]

    q8_cross = ("k_s" in cross_kv and jnp.dtype(dtype) != jnp.float32
                and _q8_cross_mode() == "commute")

    def att_self(q, cache_l, k_new, v_new):
        if q8_self:
            return _self_attention_extra_q8(
                q, cache_l["k"], cache_l["k_s"], cache_l["v"],
                cache_l["v_s"], k_new, v_new, strict_mask, D, dtype,
                q8_cross=q8_cross, mxu_t=mxu_t)
        return _self_attention_extra(
            q, cache_l["k"].astype(dtype), cache_l["v"].astype(dtype),
            k_new, v_new, strict_mask, D, dtype,
            q8_cross=q8_cross, mxu_t=mxu_t)

    def att_cross(q, cross_l):
        """Cross attention. int8 cross caches: bf16 mode defaults to the
        scale-commuted XLA formulation (_att_cross_q8 — the only route
        that actually halves the read, WHISPER_TPU_Q8_CROSS overrides);
        fp32 mode keeps the kernel/dequant routes of decoder_step_t."""
        if "k_s" in cross_l:
            mode = _q8_cross_mode()
            if not fp32_mode and mode == "commute":
                return _att_cross_q8(q.astype(dtype), cross_l, D, dtype,
                                     mxu_t=mxu_t)
            from whisper_tpu.ops.attention import default_backend
            backend = cfg.attn_backend or default_backend()
            if mode != "deq" and (
                    (backend in ("auto", "pallas")
                     and jax.default_backend() == "tpu")
                    or backend == "pallas_interpret"):
                from whisper_tpu.ops.decode_attention import (
                    decode_attention_q8_bh,
                )
                return decode_attention_q8_bh(
                    q.astype(dtype), cross_l["k"], cross_l["k_s"],
                    cross_l["v"], cross_l["v_s"], None,
                    interpret=backend == "pallas_interpret").astype(dtype)
            k = dequantize_kv(cross_l["k"], cross_l["k_s"], dtype)
            v = dequantize_kv(cross_l["v"], cross_l["v_s"], dtype)
        else:
            k = cross_l["k"].astype(dtype)
            v = cross_l["v"].astype(dtype)
        if fp32_mode:
            s = jnp.einsum("bthd,bhsd->bhts", q.astype(f32) * (D ** -0.5),
                           k.astype(f32), precision=prec)
            p = jax.nn.softmax(s, axis=-1)
            return jnp.einsum("bhts,bhsd->bthd", p, v.astype(f32),
                              precision=prec).astype(dtype)
        # bf16 cross formulation knob (trace-time env, same caveat as
        # _loop_step_mode): 'bg' streams K/V through the batch-grouped
        # Pallas decode kernel (decode_attention_bg) instead of the XLA
        # einsums — the ip-step ablation put XLA's cross at ~642 µs/step
        # vs a ~360 µs HBM floor at b32 (DESIGN.md §20 follow-up).
        import os
        ip_cross = os.environ.get("WHISPER_TPU_IP_CROSS", "xla")
        bb = int(ip_cross[2:]) if ip_cross.startswith("bg") \
            and len(ip_cross) > 2 else 8
        if ip_cross.startswith("bg") and q.shape[0] % bb == 0 and (
                jax.default_backend() == "tpu"
                or cfg.attn_backend == "pallas_interpret"):
            from whisper_tpu.ops.decode_attention import decode_attention_bg
            return decode_attention_bg(
                q.astype(dtype), k, v, None, block_b=bb,
                interpret=cfg.attn_backend == "pallas_interpret"
            ).astype(dtype)
        # MXU query tiling: same trick as _self_attention_extra — T==1
        # einsums lower as VPU convert+mul+reduce (compute-bound), T>=8
        # lowers as an MXU dot (read-bound). WHISPER_TPU_MXU_T=0 opts out.
        t8 = _mxu_query_tile(q.shape[2] * q.shape[3])
        B = q.shape[0]
        if t8 > 1:
            q8 = jnp.broadcast_to(q, (B, t8) + q.shape[2:])
            s = jnp.einsum("bthd,bhsd->bhts", q8, k,
                           preferred_element_type=f32
                           )[:, :, :1] * (D ** -0.5)
        else:
            s = jnp.einsum("bthd,bhsd->bhts", q, k,
                           preferred_element_type=f32) * (D ** -0.5)
        p = jax.nn.softmax(s, axis=-1)
        if t8 > 1:
            p8 = jnp.broadcast_to(p.astype(dtype),
                                  p.shape[:2] + (t8, p.shape[-1]))
            return jnp.einsum("bhts,bhsd->bthd", p8, v,
                              preferred_element_type=f32
                              )[:, :1].astype(dtype)
        return jnp.einsum("bhts,bhsd->bthd", p.astype(dtype), v,
                          preferred_element_type=f32).astype(dtype)

    def block(h, xs):
        lp, cache_l, cross_l = xs
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
        a = att_self(q, cache_l,
                     k_new.astype(dtype), v_new.astype(dtype))
        h = r + linear(merge_heads(a), lp["attn"]["o"])
        r = h
        y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"], cfg.ln_eps)
        q = split_heads(linear(y, lp["cross_attn"]["q"]), cfg.n_heads)
        h = r + linear(merge_heads(att_cross(q, cross_l)),
                       lp["cross_attn"]["o"])
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return h, (k_new[:, :, 0, :], v_new[:, :, 0, :])

    h, (k_news, v_news) = jax.lax.scan(
        block, h, (dec["layers"], kv_cache, cross_kv),
        unroll=cfg.n_text_layers <= 8)

    # one batched append for all layers; Pallas in-place on TPU, plain DUS
    # (identical result, XLA-lowered) elsewhere so CPU tests run fast.
    # Quantized self cache: per-vector int8 rows through the same aliased
    # kernel; the (L,B,H,S,1) scale rows land via XLA DUS — the scale
    # arrays are ~128x smaller than the cache, so §20's full-copy
    # pathology costs ~15 µs/step at medium, not ~780.
    if q8_self:
        k_news, k_sc = quantize_kv(k_news)         # (L,B,H,D) -> int8 + s
        v_news, v_sc = quantize_kv(v_news)
    if jax.default_backend() == "tpu" \
            or cfg.attn_backend == "pallas_interpret":
        from whisper_tpu.ops.cache_append import cache_append_rows
        ck, cv = cache_append_rows(
            kv_cache["k"], kv_cache["v"], k_news, v_news, pos_offset,
            interpret=cfg.attn_backend == "pallas_interpret")
    else:
        ck = jax.lax.dynamic_update_slice(
            kv_cache["k"], k_news[:, :, :, None, :].astype(
                kv_cache["k"].dtype), (0, 0, 0, pos_offset, 0))
        cv = jax.lax.dynamic_update_slice(
            kv_cache["v"], v_news[:, :, :, None, :].astype(
                kv_cache["v"].dtype), (0, 0, 0, pos_offset, 0))
    new_cache = {"k": ck, "v": cv}
    if q8_self:
        new_cache["k_s"] = jax.lax.dynamic_update_slice(
            kv_cache["k_s"], k_sc[:, :, :, None, :],
            (0, 0, 0, pos_offset, 0))
        new_cache["v_s"] = jax.lax.dynamic_update_slice(
            kv_cache["v_s"], v_sc[:, :, :, None, :],
            (0, 0, 0, pos_offset, 0))
    return final_logits(params, cfg, h), new_cache


def decoder_step_ragged(params: Params, cfg: WhisperConfig,
                        tokens1: jax.Array, pos: jax.Array,
                        kv_cache: dict[str, jax.Array],
                        cross_kv: dict[str, jax.Array],
                        ) -> tuple[jax.Array, dict[str, jax.Array]]:
    """One decode step where every batch row sits at its OWN position —
    the continuous-batching engine's kernel (sequences join/leave the batch
    mid-decode, so there is no shared pos_offset).

    Args:
      tokens1: (B, 1) int32 — each row's last token.
      pos: (B,) int32 — each row's absolute position (cache write index).
      kv_cache/cross_kv: as decoder_forward; both the plain and the int8
        (values + per-vector scales) layouts are supported — int8 halves
        per-slot HBM, i.e. 2x the continuous-serving slots per byte.
    Returns:
      logits (B, 1, vocab) fp32, updated kv_cache.

    Unquantized self-caches take the in-place path (same design as
    decoder_step_ip: read-only cache with a strict per-row `< pos[b]`
    mask + the current token's explicit softmax term, then ONE aliased
    per-row Pallas append, cache_append_rows_ragged) — the XLA scatter
    this replaces lowers as a full-cache rewrite per layer per step, the
    same ~780 µs/step pathology measured for greedy (DESIGN.md §20).

    int8 self-caches split by intent: cfg.self_kv_quant (without
    kv_cache_quant, bf16 mode) is the PERF formulation — the in-place
    path reads the cache scale-commuted (_self_attention_extra_q8,
    DESIGN.md §35; the engine's 448-slot caches make the self read
    ~25% of step bytes) and appends int8 rows via the ragged kernel
    with per-row scale scatters. cfg.kv_cache_quant (capacity mode)
    keeps the dequant scatter formulation.
    """
    dec = params["decoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    B = tokens1.shape[0]
    rows = jnp.arange(B)

    h = tok_embed(dec, tokens1, dtype)            # (B, 1, d)
    h = h + dec["pos_emb"][pos][:, None].astype(dtype)
    kv_len = pos + 1                                     # (B,)
    q8_self = ("k_s" in kv_cache and cfg.self_kv_quant
               and not cfg.kv_cache_quant
               and jnp.dtype(dtype) != jnp.float32)
    inplace = "k_s" not in kv_cache or q8_self
    S = kv_cache["k"].shape[-2]
    strict_mask = (jnp.arange(S)[None, :] < pos[:, None]
                   )[:, None, None, :]                   # (B,1,1,S)

    def scatter(cache_l: dict, name: str, new: jax.Array) -> dict:
        """Per-row scatter: row b's new K/V land at position pos[b];
        int8 caches get fresh per-vector scales for the new rows."""
        if name + "_s" in cache_l:
            qv, s = quantize_kv(new)                     # (B, H, 1, D/1)
            return {**cache_l,
                    name: cache_l[name].at[rows, :, pos, :].set(
                        qv[:, :, 0, :]),
                    name + "_s": cache_l[name + "_s"].at[rows, :, pos, :].set(
                        s[:, :, 0, :])}
        return {**cache_l,
                name: cache_l[name].at[rows, :, pos, :].set(
                    new[:, :, 0, :].astype(cache_l[name].dtype))}

    def block(h, xs):
        lp, cache_l, cross_l = xs
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        q, k_new, v_new = qkv_fused(y, lp["attn"], cfg.n_heads)
        if inplace:
            _q8c = ("k_s" in cross_kv and jnp.dtype(dtype) != jnp.float32
                    and _q8_cross_mode() == "commute")
            if q8_self:
                a = merge_heads(_self_attention_extra_q8(
                    q, cache_l["k"], cache_l["k_s"], cache_l["v"],
                    cache_l["v_s"], k_new.astype(dtype),
                    v_new.astype(dtype), strict_mask, cfg.head_dim,
                    dtype, q8_cross=_q8c))
            else:
                a = merge_heads(_self_attention_extra(
                    q, cache_l["k"].astype(dtype),
                    cache_l["v"].astype(dtype),
                    k_new.astype(dtype), v_new.astype(dtype), strict_mask,
                    cfg.head_dim, dtype, q8_cross=_q8c))
            ys = (k_new[:, :, 0, :], v_new[:, :, 0, :])
        else:
            cache_l = scatter(cache_l, "k", k_new)
            cache_l = scatter(cache_l, "v", v_new)
            a = merge_heads(_cache_attention(
                q, cache_l, kv_len, causal=False, q_offset=0, cfg=cfg,
                dtype=dtype))
            ys = cache_l
        h = r + linear(a, lp["attn"]["o"])
        r = h
        y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"], cfg.ln_eps)
        q = split_heads(linear(y, lp["cross_attn"]["q"]), cfg.n_heads)
        # int8 cross in bf16 serving mode: the scale-commuted formulation
        # (same routing as decoder_step_ip.att_cross — T==1 per row here too)
        if "k_s" in cross_l and jnp.dtype(dtype) != jnp.float32 \
                and _q8_cross_mode() == "commute":
            a = merge_heads(_att_cross_q8(q.astype(dtype), cross_l,
                                          cfg.head_dim, dtype))
        else:
            a = merge_heads(_cache_attention(
                q, cross_l, None, causal=False, q_offset=0, cfg=cfg,
                dtype=dtype))
        h = r + linear(a, lp["cross_attn"]["o"])
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return h, ys

    h, out = jax.lax.scan(
        block, h, (dec["layers"], kv_cache, cross_kv),
        unroll=cfg.n_text_layers <= 8)

    if not inplace:
        return final_logits(params, cfg, h), out

    k_news, v_news = out                                 # (L, B, H, D)
    if q8_self:
        k_news, k_sc = quantize_kv(k_news)               # int8 + (L,B,H,1)
        v_news, v_sc = quantize_kv(v_news)
    if jax.default_backend() == "tpu" \
            or cfg.attn_backend == "pallas_interpret":
        from whisper_tpu.ops.cache_append import cache_append_rows_ragged
        ck, cv = cache_append_rows_ragged(
            kv_cache["k"], kv_cache["v"], k_news, v_news, pos,
            interpret=cfg.attn_backend == "pallas_interpret")
    else:
        # separated advanced indices (rows, pos) land in FRONT positions:
        # the update value must be (B, L, H, D)
        ck = kv_cache["k"].at[:, rows, :, pos, :].set(
            jnp.swapaxes(k_news, 0, 1).astype(kv_cache["k"].dtype))
        cv = kv_cache["v"].at[:, rows, :, pos, :].set(
            jnp.swapaxes(v_news, 0, 1).astype(kv_cache["v"].dtype))
    new_cache = {"k": ck, "v": cv}
    if q8_self:
        # per-row scale scatters: XLA rewrites the scale arrays, but they
        # are D/1 = 64x smaller than the caches the ragged kernel spares
        new_cache["k_s"] = kv_cache["k_s"].at[:, rows, :, pos, :].set(
            jnp.swapaxes(k_sc, 0, 1))
        new_cache["v_s"] = kv_cache["v_s"].at[:, rows, :, pos, :].set(
            jnp.swapaxes(v_sc, 0, 1))
    return final_logits(params, cfg, h), new_cache
