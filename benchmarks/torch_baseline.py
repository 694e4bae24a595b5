"""PyTorch/HF greedy baseline (the role of reference benchmark_python.py:8-34,
reimplemented for this repo's harness): time torch WhisperForConditionalGeneration
greedy generation on the same mel input shape the TPU engine consumes, so A/B
numbers share a workload definition.

Usage:
    python benchmarks/torch_baseline.py [--model-dir <hf checkpoint dir>]
        [--mel sample_input.bin] [--gen-tokens 89] [--threads N]

Without --model-dir (no network in most environments) a seeded random-init
whisper-tiny is used — valid for *throughput* baselines since greedy decode
cost does not depend on weight values when the token count is pinned.
Prints one JSON line: {"metric", "value", "unit", ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--model-dir", default=None,
                   help="local HF checkpoint (default: seeded random tiny)")
    p.add_argument("--mel", default=None,
                   help="80x3000 fp32 mel .bin (default: random)")
    p.add_argument("--gen-tokens", type=int, default=89,
                   help="forced generation length (golden clip: 89)")
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--threads", type=int, default=None)
    p.add_argument("--repeats", type=int, default=3)
    args = p.parse_args()

    import torch
    if args.threads:
        torch.set_num_threads(args.threads)

    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    if args.model_dir:
        model = WhisperForConditionalGeneration.from_pretrained(args.model_dir)
    else:
        torch.manual_seed(0)
        model = WhisperForConditionalGeneration(HFConfig(
            vocab_size=51_865, num_mel_bins=80, d_model=384,
            encoder_layers=4, encoder_attention_heads=6,
            decoder_layers=4, decoder_attention_heads=6,
            encoder_ffn_dim=1536, decoder_ffn_dim=1536,
            max_source_positions=1500, max_target_positions=448,
            activation_function="gelu"))
    model.eval()

    if args.mel:
        mel = np.fromfile(args.mel, dtype="<f4").reshape(1, 80, 3000)
        mel = np.tile(mel, (args.batch, 1, 1))
    else:
        mel = (np.random.RandomState(0).randn(args.batch, 80, 3000) * 0.5
               ).astype(np.float32)
    feats = torch.from_numpy(mel)

    def run():
        with torch.no_grad():
            return model.generate(
                feats, do_sample=False, num_beams=1,
                min_new_tokens=args.gen_tokens, max_new_tokens=args.gen_tokens)

    run()                                     # warmup
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    p50 = float(np.median(times))
    rtfx = args.batch * 30.0 / p50
    print(json.dumps({
        "metric": f"torch_cpu_rtfx_tiny_b{args.batch}_greedy{args.gen_tokens}",
        "value": round(rtfx, 2),
        "unit": "audio_s_per_wall_s",
        "p50_e2e_s": round(p50, 4),
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
