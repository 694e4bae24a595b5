"""Minimal in-tree repro + compiler canary for the §31 XLA/Mosaic
miscompile (DESIGN.md §31; guard at decode.py `_beam_loop`).

The fault: with weight-only int8 (wq) AND commuted int8 cross-KV (cq)
both on, the MXU-query-tiled decoder step (`WHISPER_TPU_MXU_T=8`) dies
at runtime with "TPU device error - kernel fault" when driven by the
BEAM loop at exactly B*W = 40 rows on v5e (greedy at 8/32/40/64 rows is
clean; beam at 160 rows is clean; each quant feature alone is clean —
the fault needs the beam KV-gather + tiled-step fusion).

Run this on every compiler/libtpu update:

    python benchmarks/repro_beam_fault.py       # exit 0 = bug FIXED
                                                # exit 1 = still faults

The day it exits 0, drop the `beam_mxu_t = 0` guard in decode.py's
`_beam_loop` and re-run benchmarks/beam_bench.py --wq --cq to re-tune
the beam tiling default. Exit 2 = unexpected failure mode (investigate:
the guard may be masking something new). Needs the real chip (the fault
is a Mosaic runtime kernel fault; CPU interpret mode cannot reproduce).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# force the tiled step THROUGH the guard: explicit env wins in _beam_loop
os.environ["WHISPER_TPU_MXU_T"] = "8"

import jax
import jax.numpy as jnp
import numpy as np


def main() -> int:
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import beam_decode, encode
    from whisper_tpu.models.whisper import init_params, quantize_weights_wq
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import to_device

    if jax.devices()[0].platform not in ("tpu", "axon"):
        print("repro_beam_fault: needs the real TPU; skipping (exit 3)")
        return 3

    cfg = get_config("tiny").replace(compute_dtype="bfloat16",
                                     weight_quant=True, cross_kv_quant=True)
    params = quantize_weights_wq(
        to_device(init_params(cfg, jax.random.PRNGKey(0)), jnp.bfloat16),
        cfg)
    B, W = 8, 5  # the faulting row count: B*W = 40
    rng = np.random.RandomState(0)
    mel = jnp.asarray(rng.randn(B, cfg.n_mels, cfg.n_frames)
                      .astype(np.float32) * 0.5)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    try:
        res = beam_decode(params, cfg, encode(params, cfg, mel), prompt,
                          beam_size=W, max_new=16)
        res.tokens.block_until_ready()
    except Exception as e:  # the fault surfaces as XlaRuntimeError
        msg = str(e)
        if "kernel fault" in msg or "device error" in msg.lower():
            print(f"repro_beam_fault: STILL FAULTS ({type(e).__name__}); "
                  f"keep the decode.py guard")
            return 1
        print(f"repro_beam_fault: UNEXPECTED failure: {msg[:500]}")
        return 2
    print("repro_beam_fault: clean — the §31 miscompile is FIXED in this "
          "toolchain; drop the beam_mxu_t guard in decode.py:_beam_loop "
          "and re-tune with benchmarks/beam_bench.py --wq --cq")
    return 0


if __name__ == "__main__":
    sys.exit(main())
