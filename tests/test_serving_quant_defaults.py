"""The bf16 serving quantization defaults (DESIGN.md §29).

WhisperPipeline(quant="auto") — the default — turns on weight-only int8
decoder weights + scale-commuted int8 cross-KV for bf16 configs (the
measured-best single-chip serving config at every family size), while
fp32 token-parity mode and explicitly-flagged configs pass through
unchanged. The reference has no quantization at all (fp32 throughout,
whisper_tensor.mojo); this is a capability extension, so the tests pin
OUR policy contract rather than reference behavior.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.config import apply_serving_quant
from whisper_tpu.pipeline import WhisperPipeline


@pytest.fixture()
def nano_bf16_plain(small_cfg):
    return small_cfg.replace(compute_dtype="bfloat16")


def test_policy_bf16_enables_wq_cq(nano_bf16_plain):
    cfg = apply_serving_quant(nano_bf16_plain)
    assert cfg.weight_quant and cfg.cross_kv_quant
    assert not cfg.kv_cache_quant  # capacity feature stays opt-in


def test_policy_fp32_untouched(small_cfg):
    assert apply_serving_quant(small_cfg) is small_cfg


def test_policy_encoder_mlp_quant_by_width():
    """§32b in-kernel int8 encoder MLP: on at the measured-positive widths
    (d>=768: small +4.5% .. large +12.9% encoder phase), off below until
    measured."""
    from whisper_tpu.config import get_config
    for name, want in (("small", True), ("medium", True),
                       ("large-v2", True), ("large-v3-turbo", True),
                       ("tiny", False), ("base", False)):
        cfg = apply_serving_quant(
            get_config(name).replace(compute_dtype="bfloat16"))
        assert cfg.encoder_mlp_quant is want, name


def test_policy_encoder_qkv_quant_by_width():
    """§32b QKV addendum: the XLA int8 QKV hybrid in front of the fused
    tail is on at d>=1024 (measured e2e medium +0.9%, large-v2 +1.0%,
    turbo +2.5%), off below (small's encoder phase win didn't clear the
    e2e noise floor; tiny/base have no int8 tail to ride)."""
    from whisper_tpu.config import get_config
    for name, want in (("medium", True), ("large-v2", True),
                       ("large-v3", True), ("large-v3-turbo", True),
                       ("small", False), ("tiny", False), ("base", False)):
        cfg = apply_serving_quant(
            get_config(name).replace(compute_dtype="bfloat16"))
        assert cfg.encoder_qkv_quant is want, name


def test_policy_self_kv_quant_by_depth_and_width():
    """§35 commuted int8 SELF cache: on where the decode loop is a
    dominant bandwidth-bound e2e share — deep decoders at d>=1024
    (medium +2.3%, large-v2 +5.1% e2e). Turbo (d=1280 but a 4-layer
    decoder, encoder-dominated) measured -1.5% and stays OFF; tiny
    -8.9%."""
    from whisper_tpu.config import get_config
    for name, want in (("medium", True), ("large-v2", True),
                       ("large-v3", True), ("large-v3-turbo", False),
                       ("small", False), ("tiny", False), ("base", False)):
        cfg = apply_serving_quant(
            get_config(name).replace(compute_dtype="bfloat16"))
        assert cfg.self_kv_quant is want, name


def test_policy_explicit_flag_wins(nano_bf16_plain):
    # a user who chose ONLY cross-KV quant keeps exactly that
    cfg = nano_bf16_plain.replace(cross_kv_quant=True)
    assert apply_serving_quant(cfg) is cfg


def test_policy_explicit_encoder_flags_win(nano_bf16_plain):
    """The encoder quant flags are part of the explicit-choice passthrough
    too: a forced encoder_mlp_quant/encoder_qkv_quant below its default
    width must survive (the width policy would otherwise reset it)."""
    for flag in ("encoder_mlp_quant", "encoder_qkv_quant"):
        cfg = nano_bf16_plain.replace(**{flag: True})
        assert apply_serving_quant(cfg) is cfg, flag


def test_policy_kill_switch(nano_bf16_plain, monkeypatch):
    monkeypatch.setenv("WHISPER_TPU_AUTO_QUANT", "0")
    assert apply_serving_quant(nano_bf16_plain) is nano_bf16_plain


def test_pipeline_auto_quantizes_bf16(nano_bf16_plain):
    pipe = WhisperPipeline.from_random(nano_bf16_plain)
    assert pipe.cfg.weight_quant and pipe.cfg.cross_kv_quant
    assert pipe.params["decoder"]["tok_emb"].dtype == jnp.int8
    assert "tok_emb_s" in pipe.params["decoder"]


def test_pipeline_quant_off(nano_bf16_plain):
    pipe = WhisperPipeline.from_random(nano_bf16_plain, quant="off")
    assert not pipe.cfg.weight_quant and not pipe.cfg.cross_kv_quant
    assert pipe.params["decoder"]["tok_emb"].dtype == jnp.bfloat16
    with pytest.raises(ValueError, match="quant"):
        WhisperPipeline.from_random(nano_bf16_plain, quant="int4")


def test_pipeline_fp32_stays_parity_mode(small_cfg):
    pipe = WhisperPipeline.from_random(small_cfg)
    assert not pipe.cfg.weight_quant and not pipe.cfg.cross_kv_quant
    assert pipe.params["decoder"]["tok_emb"].dtype == jnp.float32


def test_auto_quant_pipeline_transcribes(nano_bf16_plain):
    """e2e through the quantized-serving default: the auto pipeline decodes
    a window and its tokens match a pipeline with the same flags set
    explicitly (policy only selects flags, never changes semantics)."""
    rng = np.random.RandomState(0)
    audio = (rng.randn(16000) * 0.1).astype(np.float32)
    auto = WhisperPipeline.from_random(nano_bf16_plain)
    r_auto = auto.transcribe_window(audio, max_new=8)
    explicit = WhisperPipeline.from_random(
        nano_bf16_plain.replace(weight_quant=True, cross_kv_quant=True))
    r_exp = explicit.transcribe_window(audio, max_new=8)
    assert r_auto.tokens == r_exp.tokens


def test_policy_dtype_object_fp32_passthrough(small_cfg):
    """A cfg built with a dtype OBJECT (jnp.float32, not the string) must
    hit the same fp32 passthrough, not fail later in quantize_weights_wq."""
    cfg = small_cfg.replace(compute_dtype=jnp.float32)
    assert apply_serving_quant(cfg) is cfg


def test_policy_batch_gate_small_batch_tiny_width(nano_bf16_plain):
    """Below the measured break-even (b<=8 at tiny width, DESIGN.md §29b
    batch sweep: tiny b8 −3%, b1 wash-to-negative) the auto policy keeps
    quant OFF; batched serving and unknown batch keep it on."""
    assert apply_serving_quant(nano_bf16_plain, batch=1) is nano_bf16_plain
    assert apply_serving_quant(nano_bf16_plain, batch=8) is nano_bf16_plain
    for batch in (None, 16, 32):
        cfg = apply_serving_quant(nano_bf16_plain, batch=batch)
        assert cfg.weight_quant and cfg.cross_kv_quant


def test_policy_batch_gate_never_fires_at_wide_widths():
    """Widths >= 512 keep quant even at small batch (measured wins at b8:
    large-v2 +18% DESIGN.md §29; base b8 §32b)."""
    from whisper_tpu.config import get_config
    for name in ("base", "medium", "large-v2"):
        cfg = apply_serving_quant(
            get_config(name).replace(compute_dtype="bfloat16"), batch=1)
        assert cfg.weight_quant, name


def test_pipeline_batch_hint_single_stream(nano_bf16_plain):
    pipe = WhisperPipeline.from_random(nano_bf16_plain, batch_hint=1)
    assert not pipe.cfg.weight_quant and not pipe.cfg.cross_kv_quant
    assert pipe.params["decoder"]["tok_emb"].dtype == jnp.bfloat16


def test_policy_768_carveout():
    """d_model=768 (small) is the one measured width where int8 cross-KV
    loses e2e (-3.7% at equal chain length, DESIGN.md §29b): the policy
    keeps weight-only int8 there and skips cq."""
    from whisper_tpu.config import get_config
    s = apply_serving_quant(
        get_config("small").replace(compute_dtype="bfloat16"))
    assert s.weight_quant and not s.cross_kv_quant
    m = apply_serving_quant(
        get_config("medium").replace(compute_dtype="bfloat16"))
    assert m.weight_quant and m.cross_kv_quant
