"""Size-based attention backend policy (the measured thresholds)."""

import jax.numpy as jnp
import numpy as np

from whisper_tpu.ops.attention import (
    _DECODE_PALLAS_MIN_S,
    _FLASH_MIN_SCORE_BYTES,
    _auto_backend,
)


def _q(B, T, H, D=64):
    return jnp.zeros((B, T, H, D), jnp.float32)


def _k(B, S, H, D=64):
    return jnp.zeros((B, H, S, D), jnp.float32)


def test_decode_policy_by_cache_length():
    # Whisper self-attn cache (448): XLA wins END-TO-END (fusion into the
    # surrounding projections beats the kernel's standalone edge, DESIGN §9)
    assert _auto_backend(_q(8, 1, 6), _k(8, 448, 6)) == "reference"
    # Whisper cross-attn (1500): XLA
    assert _auto_backend(_q(8, 1, 6), _k(8, 1500, 6)) == "reference"
    # long cache: streaming kernel
    assert _auto_backend(_q(8, 1, 6), _k(8, _DECODE_PALLAS_MIN_S, 6)) == "pallas"


def test_prefill_policy_by_score_bytes():
    # tiny encoder batch 8: 432 MB of scores -> flash (measured 3.0x win,
    # phases.py r2); batch 1: 54 MB -> still flash
    assert _auto_backend(_q(8, 1500, 6), _k(8, 1500, 6)) == "pallas"
    assert _auto_backend(_q(1, 1500, 6), _k(1, 1500, 6)) == "pallas"
    # large-v3 encoder batch 8: 8*20*1500*1500*4 = 1.44 GB -> flash
    assert _auto_backend(_q(8, 1500, 20), _k(8, 1500, 20)) == "pallas"
    # threshold arithmetic: 16 MB boundary
    B, H, T, S = 1, 1, 1 << 11, 1 << 11
    assert B * H * T * S * 4 == _FLASH_MIN_SCORE_BYTES
    assert _auto_backend(_q(B, T, H), _k(B, S, H)) == "pallas"


def test_prefill_small_is_reference():
    assert _auto_backend(_q(1, 4, 6), _k(1, 448, 6)) == "reference"
