"""int8 MXU encoder projections (cfg.encoder_quant, DESIGN.md §32).

The serving-mode encoder can run its QKV/o/fc1/fc2 projections as s8xs8
MXU dots with dynamic per-token activation scales. These tests pin the
numerics contract (close to the bf16 path — activation quantization is
~0.8% per-element, bounded by the per-token max), the fp32 passthrough
(token-parity mode never quantizes), and that the quantized-weight linear
matches an explicitly dequantized oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.models.whisper import (
    _quant_cols,
    encoder_forward,
    init_params,
    linear_i8dyn,
    qkv_fused,
    qkv_fused_i8dyn,
)
from whisper_tpu.weights import to_device


@pytest.fixture(scope="module")
def nano_bf16(small_cfg):
    cfg = small_cfg.replace(compute_dtype="bfloat16")
    params = to_device(init_params(cfg, jax.random.PRNGKey(0)),
                       jnp.bfloat16)
    return cfg, params


def test_linear_i8dyn_matches_dequant_oracle():
    """Running the int8 linear == quantize-then-dequantize by hand (the
    rescale is exact in f32; only the int8 rounding differs from bf16)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(4, 96).astype(np.float32), jnp.bfloat16)
    p = {"w": jnp.asarray(rng.randn(96, 64).astype(np.float32) * 0.05,
                          jnp.bfloat16),
         "b": jnp.asarray(rng.randn(64).astype(np.float32) * 0.01,
                          jnp.bfloat16)}
    got = np.asarray(linear_i8dyn(x, p, jnp.bfloat16), np.float32)

    wq, ws = _quant_cols(p["w"])
    xf = np.asarray(x, np.float32)
    sx = np.maximum(np.abs(xf).max(-1, keepdims=True) / 127.0, 1e-10)
    xq = np.clip(np.round(xf / sx), -127, 127)
    ref = ((xq @ np.asarray(wq, np.float32)) * (sx * np.asarray(ws))
           ).astype(np.float32)
    ref = (ref.astype(jnp.bfloat16).astype(np.float32)
           + np.asarray(p["b"], np.float32))
    np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-2)


def test_qkv_i8dyn_close_to_bf16(nano_bf16):
    cfg, params = nano_bf16
    lp = jax.tree.map(lambda x: x[0], params["encoder"]["layers"])
    rng = np.random.RandomState(1)
    y = jnp.asarray(rng.randn(2, 64, cfg.d_model).astype(np.float32),
                    jnp.bfloat16)
    q0, k0, v0 = qkv_fused(y, lp["attn"], cfg.n_heads)
    q1, k1, v1 = qkv_fused_i8dyn(y, lp["attn"], cfg.n_heads, jnp.bfloat16)
    for a, b in ((q0, q1), (k0, k1), (v0, v1)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(a).max() + 1e-9
        assert np.abs(a - b).max() / denom < 0.05


def test_encoder_quant_output_close_and_shaped(nano_bf16):
    cfg, params = nano_bf16
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    a = np.asarray(encoder_forward(params, cfg, mel), np.float32)
    b = np.asarray(encoder_forward(
        params, cfg.replace(encoder_quant=True), mel), np.float32)
    assert a.shape == b.shape
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.05


def test_encoder_quant_fp32_passthrough(small_cfg):
    """fp32 = token-parity mode: encoder_quant must be a no-op there
    (bit-identical output, not merely close)."""
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    mel = jnp.asarray((rng.randn(1, small_cfg.n_mels, small_cfg.n_frames)
                       * 0.5).astype(np.float32))
    a = np.asarray(encoder_forward(params, small_cfg, mel))
    b = np.asarray(encoder_forward(
        params, small_cfg.replace(encoder_quant=True), mel))
    np.testing.assert_array_equal(a, b)


def test_encoder_mlp_quant_in_kernel_close(nano_bf16):
    """§32b: int8 fc1/fc2 INSIDE the fused tail (interpret mode) tracks
    the bf16 fused tail within activation-quant tolerance."""
    cfg, params = nano_bf16
    cfg = cfg.replace(attn_backend="pallas_interpret")
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    a = np.asarray(encoder_forward(params, cfg, mel), np.float32)
    b = np.asarray(encoder_forward(
        params, cfg.replace(encoder_mlp_quant=True), mel), np.float32)
    assert a.shape == b.shape
    assert not np.array_equal(a, b)      # the int8 path actually engaged
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.05


def test_encoder_mlp_quant_close_to_xla_i8(nano_bf16):
    """§32b in-kernel numerics vs the §32 XLA oracle: both quantize fc1/fc2
    per-output-column with dynamic per-row act scales, so their MLP math is
    the same up to bf16 rounding points and the XLA path's additional
    QKV/o quantization — bound the gap at the same 5%."""
    cfg, params = nano_bf16
    rng = np.random.RandomState(2)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    xla_i8 = np.asarray(encoder_forward(
        params, cfg.replace(encoder_quant=True), mel), np.float32)
    kern_i8 = np.asarray(encoder_forward(
        params, cfg.replace(encoder_mlp_quant=True,
                            attn_backend="pallas_interpret"), mel),
        np.float32)
    assert (np.abs(xla_i8 - kern_i8).max()
            / (np.abs(xla_i8).max() + 1e-9) < 0.05)


def test_encoder_oproj_quant_close(nano_bf16, monkeypatch):
    """int8 o-projection (default-on with encoder_mlp_quant, §32b
    addendum): same 5% proximity bound as the MLP quant vs the
    WHISPER_TPU_ENC_I8O=0 opt-out, and it must actually change the
    output (i.e. the default really quantizes wo)."""
    cfg, params = nano_bf16
    cfg = cfg.replace(attn_backend="pallas_interpret",
                      encoder_mlp_quant=True)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    monkeypatch.setenv("WHISPER_TPU_ENC_I8O", "0")
    a = np.asarray(encoder_forward(params, cfg, mel), np.float32)
    monkeypatch.delenv("WHISPER_TPU_ENC_I8O")
    b = np.asarray(encoder_forward(params, cfg, mel), np.float32)
    assert not np.array_equal(a, b)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.05


def test_encoder_qkv_quant_close(nano_bf16, monkeypatch):
    """XLA int8 QKV in front of the fused tail (WHISPER_TPU_ENC_I8Q
    experiment): 5% proximity bound vs the shipped quant path, and it
    must actually change the output."""
    cfg, params = nano_bf16
    cfg = cfg.replace(attn_backend="pallas_interpret",
                      encoder_mlp_quant=True)
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(2, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    a = np.asarray(encoder_forward(params, cfg, mel), np.float32)
    monkeypatch.setenv("WHISPER_TPU_ENC_I8Q", "1")
    b = np.asarray(encoder_forward(params, cfg, mel), np.float32)
    assert not np.array_equal(a, b)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 0.05


def test_encoder_mlp_quant_noop_without_tail(nano_bf16):
    """§32b lives inside the tail kernel: with the tail off (CPU auto
    mode) the flag must change nothing (bit-identical)."""
    cfg, params = nano_bf16
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    a = np.asarray(encoder_forward(params, cfg, mel))
    b = np.asarray(encoder_forward(
        params, cfg.replace(encoder_mlp_quant=True), mel))
    np.testing.assert_array_equal(a, b)


def test_encoder_mlp_quant_fp32_passthrough(small_cfg):
    params = init_params(small_cfg, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    mel = jnp.asarray((rng.randn(1, small_cfg.n_mels, small_cfg.n_frames)
                       * 0.5).astype(np.float32))
    a = np.asarray(encoder_forward(
        params, small_cfg.replace(attn_backend="pallas_interpret"), mel))
    b = np.asarray(encoder_forward(
        params, small_cfg.replace(attn_backend="pallas_interpret",
                                  encoder_mlp_quant=True), mel))
    np.testing.assert_array_equal(a, b)


def test_encoder_quant_env_override(nano_bf16, monkeypatch):
    """WHISPER_TPU_ENC_I8=0 forces the bf16 path even when the cfg flag is
    on (trace-time knob, read per encoder_forward call here)."""
    cfg, params = nano_bf16
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(1, cfg.n_mels, cfg.n_frames) * 0.5,
                      jnp.bfloat16)
    ref = np.asarray(encoder_forward(params, cfg, mel))
    monkeypatch.setenv("WHISPER_TPU_ENC_I8", "0")
    forced_off = np.asarray(encoder_forward(
        params, cfg.replace(encoder_quant=True), mel))
    np.testing.assert_array_equal(ref, forced_off)
