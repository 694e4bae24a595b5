"""Multi-head attention — XLA reference implementation.

This is the semantic ground truth the Pallas kernels (flash_attention.py,
decode_attention.py) are parity-tested against, and the fallback on backends
where Pallas/Mosaic is unavailable (e.g. the CPU test mesh).

Replaces the reference's two attention kernels: the prefill/encoder path
(reference layers.mojo:273-342 — per-head score matmul, scale+mask, softmax,
weighted-V) and the q_len==1 register-cached decode path (reference
layers.mojo:186-272). Here both are one batched einsum formulation; XLA maps
the contractions onto the MXU and fuses scale/mask/softmax.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def mha_reference(q: jax.Array, k: jax.Array, v: jax.Array,
                  mask: Optional[jax.Array] = None,
                  precision=jax.lax.Precision.HIGHEST) -> jax.Array:
    """Scaled dot-product attention over explicit head dims.

    Args:
      q: (B, T, H, D) queries.
      k: (B, S, H, D) keys.
      v: (B, S, H, D) values.
      mask: optional boolean (..., T, S) broadcastable; True = attend.
            (The reference expresses this as cache-relative index compares,
            layers.mojo:213,311-317.)
    Returns:
      (B, T, H, D) attention output.

    Scaling matches HF/reference: q * head_dim**-0.5 before the score matmul
    (reference layers.mojo:184: scale = 1/sqrt(64)).
    """
    head_dim = q.shape[-1]
    qf = q.astype(jnp.float32) * (head_dim ** -0.5)
    scores = jnp.einsum("bthd,bshd->bhts", qf, k.astype(jnp.float32),
                        precision=precision)
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None]
        elif mask.ndim == 3:
            mask = mask[:, None]
        scores = jnp.where(mask, scores, _NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhts,bshd->bthd", probs, v.astype(jnp.float32),
                     precision=precision)
    return out.astype(q.dtype)
