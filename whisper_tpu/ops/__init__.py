"""Compute kernels: XLA reference implementations + Pallas TPU kernels.

Replaces the reference's hand-SIMD kernel layer (whisper_tensor.mojo:151-439:
matmul/conv1d/layer_norm/softmax/gelu/argmax and the register-cached decode
attention in layers.mojo:186-342). On TPU, elementwise ops (gelu, layernorm,
softmax, residual adds) are left to XLA fusion — hand-scheduling them would
only hurt; the attention paths get dedicated Pallas kernels with XLA
fallbacks, each parity-tested against the reference implementation here.
"""

from whisper_tpu.ops.attention import (
    default_backend,
    mha_reference,
    multi_head_attention,
)
