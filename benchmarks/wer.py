"""WER/CER evaluation harness (VERDICT r1 Next #4).

Two modes:

1. Manifest scoring (real data, real weights):
       python benchmarks/wer.py --weights tiny.npz --manifest eval.jsonl
   where each manifest line is {"audio": "path.wav", "text": "reference"}.
   Reports corpus WER/CER of the pipeline transcript vs the labels.

2. Offline numerics A/B (no data or checkpoints needed — the default):
       python benchmarks/wer.py [--model tiny] [--clips 6] [--max-new 32]
   Transcribes seeded synthetic clips with the fp32 token-parity config
   (the reference's bit-identical-to-torch mode) as the *reference
   transcript*, then scores each serving variant against it:
       bf16            — the serving dtype
       bf16 + int8 KV  — quantized-cache mode
       bf16 + beam 5   — beam search
   With random weights the text is degenerate, so the headline number is
   token error rate (token_er) — exactly the quantity that answers "does
   this numerics mode change what the model emits?" — with WER/CER reported
   alongside. The same harness produces real WER the moment real weights
   and audio exist; nothing else changes.

The reference framework has no quality measurement at all (its check is a
printed transcript, reference main.mojo:34-43); this harness is the
quantified replacement. Prints one JSON line per variant plus a summary
table on stderr.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synthetic_clips(n: int, n_samples: int, sample_rate: int
                    ) -> list[np.ndarray]:
    """Deterministic multi-tone + noise clips (seeded)."""
    rng = np.random.RandomState(1234)
    t = np.arange(n_samples) / sample_rate
    clips = []
    for i in range(n):
        f0 = 120.0 + 60.0 * i
        x = (0.30 * np.sin(2 * np.pi * f0 * t)
             + 0.15 * np.sin(2 * np.pi * (2.3 * f0) * t + 0.7)
             + 0.05 * rng.randn(n_samples))
        # amplitude envelope so windows differ along time
        x *= 0.5 + 0.5 * np.sin(2 * np.pi * 0.25 * t + i)
        clips.append(x.astype(np.float32))
    return clips


def build_pipeline(model: str, dtype: str, kv_quant: bool,
                   weights: str | None, cfg_overrides: dict | None = None):
    import jax

    # The axon sitecustomize force-selects the TPU; quality A/B runs are
    # CPU-deterministic by default (WHISPER_WER_PLATFORM=axon opts back in).
    jax.config.update("jax_platforms",
                      os.environ.get("WHISPER_WER_PLATFORM", "cpu"))
    import jax.numpy as jnp

    from whisper_tpu.config import get_config
    from whisper_tpu.models.whisper import init_params
    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.weights import to_device

    cfg = get_config(model).replace(compute_dtype=dtype, kv_cache_quant=kv_quant)
    if cfg_overrides:
        cfg = cfg.replace(**cfg_overrides)
    if weights:
        from whisper_tpu import weights as W
        loader = (W.from_flat_bin_path if weights.endswith(".bin")
                  else W.from_safetensors if weights.endswith(".safetensors")
                  else W.load_npz)
        params = loader(weights, cfg)
    else:
        params = init_params(cfg, jax.random.PRNGKey(0))
    if dtype == "bfloat16":
        params = to_device(params, jnp.bfloat16)
    return WhisperPipeline(cfg, params)


def run_ab(args) -> None:
    from whisper_tpu.utils.metrics import cer, token_er, wer

    # deep-decoder override: sq/quant rounding compounds once per decoder
    # layer, so the tiny 4-layer A/B under-stresses the adopted depths
    # (medium 24 / large 32); --n-text-layers builds an L-deep variant of
    # the same width for every leg including the fp32 reference
    depth_override = ({"n_text_layers": args.n_text_layers}
                      if args.n_text_layers else {})
    on_chip = os.environ.get("WHISPER_WER_PLATFORM", "cpu") != "cpu"
    # Pallas kernels run natively on the chip; CPU legs need interpret
    tail_backend = {} if on_chip else {"attn_backend": "pallas_interpret"}

    cfg_probe = build_pipeline(args.model, "float32", False, args.weights,
                               depth_override).cfg
    clips = synthetic_clips(args.clips, cfg_probe.n_samples,
                            cfg_probe.sample_rate)

    # the exact shipped policy for this width x depth (batched serving):
    # what a user actually runs at --model <m> defaults
    from whisper_tpu.config import apply_serving_quant, get_config
    shipped = apply_serving_quant(
        get_config(args.model).replace(compute_dtype="bfloat16",
                                       **depth_override), batch=32)
    serving_cfg = dict(weight_quant=shipped.weight_quant,
                       cross_kv_quant=shipped.cross_kv_quant,
                       self_kv_quant=shipped.self_kv_quant,
                       encoder_mlp_quant=shipped.encoder_mlp_quant,
                       encoder_qkv_quant=shipped.encoder_qkv_quant,
                       **tail_backend)

    variants = [
        ("fp32_greedy", dict(dtype="float32", kv_quant=False, beam=1)),
        ("bf16_greedy", dict(dtype="bfloat16", kv_quant=False, beam=1)),
        ("bf16_int8kv", dict(dtype="bfloat16", kv_quant=True, beam=1)),
        ("bf16_beam5", dict(dtype="bfloat16", kv_quant=False, beam=5)),
        # §32b in-kernel int8 MLP; interpret-mode tail so the CPU A/B
        # exercises the same kernel math the chip runs
        ("bf16_enc_i8k", dict(dtype="bfloat16", kv_quant=False, beam=1,
                              cfg=dict(encoder_mlp_quant=True,
                                       **tail_backend))),
        # §32b QKV addendum: the full adopted encoder-quant stack
        # (int8 MLP + o inside the tail, XLA int8 QKV in front)
        ("bf16_enc_i8q", dict(dtype="bfloat16", kv_quant=False, beam=1,
                              cfg=dict(encoder_mlp_quant=True,
                                       encoder_qkv_quant=True,
                                       **tail_backend))),
        # §35 commuted int8 SELF cache (sq): same int8 rounding as the
        # kv_cache_quant capacity mode but read scale-commuted
        ("bf16_sq", dict(dtype="bfloat16", kv_quant=False, beam=1,
                         cfg=dict(self_kv_quant=True))),
        # the FULL shipped serving policy at this width x depth (what
        # `--model {m}` actually runs batched): per-width divergence rows
        # for VERDICT r4 weak #4
        ("bf16_serving", dict(dtype="bfloat16", kv_quant=False, beam=1,
                              cfg=serving_cfg)),
    ]
    if args.variants:
        keep = set(args.variants.split(","))
        variants = [v for v in variants
                    if v[0] in keep or v[0] in ("fp32_greedy", args.ref)]
    results: dict[str, list] = {}
    for name, v in variants:
        pipe = build_pipeline(args.model, v["dtype"], v["kv_quant"],
                              args.weights,
                              {**depth_override, **(v.get("cfg") or {})})
        opts = pipe.make_options(beam_size=v["beam"])
        outs = []
        for clip in clips:
            r = pipe.transcribe_window(clip, max_new=args.max_new, opts=opts)
            outs.append((r.tokens, r.text))
        results[name] = outs

    ref = results[args.ref]
    print(f"{'variant':<14}{'token_er':>10}{'wer':>8}{'cer':>8}"
          f"   (vs {args.ref})", file=sys.stderr)
    for name, _ in variants:
        if name == args.ref:
            continue
        hyp = results[name]
        ters = [token_er(r[0], h[0]) for r, h in zip(ref, hyp)]
        wers = [wer(r[1], h[1]) for r, h in zip(ref, hyp)]
        cers = [cer(r[1], h[1]) for r, h in zip(ref, hyp)]
        ref_tag = "fp32" if args.ref == "fp32_greedy" else args.ref
        row = {"metric": f"wer_ab_{name}_vs_{ref_tag}",
               "token_er": round(float(np.mean(ters)), 4),
               "wer": round(float(np.mean(wers)), 4),
               "cer": round(float(np.mean(cers)), 4),
               "clips": len(clips), "max_new": args.max_new,
               "model": args.model,
               "n_text_layers": (args.n_text_layers
                                 or cfg_probe.n_text_layers),
               "platform": ("axon" if on_chip else "cpu")}
        print(json.dumps(row))
        print(f"{name:<14}{row['token_er']:>10.4f}{row['wer']:>8.4f}"
              f"{row['cer']:>8.4f}", file=sys.stderr)


def run_manifest(args) -> None:
    from whisper_tpu.pipeline import load_wav
    from whisper_tpu.utils.metrics import cer, wer

    pipe = build_pipeline(args.model, args.dtype, args.kv_quant, args.weights)
    opts = pipe.make_options(beam_size=args.beam)
    refs, hyps = [], []
    with open(args.manifest) as f:
        for line in f:
            if not line.strip():
                continue
            item = json.loads(line)
            audio = load_wav(item["audio"], pipe.cfg.sample_rate)
            r = pipe.transcribe(audio, opts=opts)
            refs.append(item["text"])
            hyps.append(r.text)
            print(f"  ref: {item['text']!r}\n  hyp: {r.text!r}",
                  file=sys.stderr)
    corpus_wer = float(np.mean([wer(r, h) for r, h in zip(refs, hyps)]))
    corpus_cer = float(np.mean([cer(r, h) for r, h in zip(refs, hyps)]))
    print(json.dumps({
        "metric": f"wer_{args.model}_{args.dtype}"
                  + ("_int8kv" if args.kv_quant else "")
                  + (f"_beam{args.beam}" if args.beam > 1 else ""),
        "wer": round(corpus_wer, 4), "cer": round(corpus_cer, 4),
        "utterances": len(refs),
    }))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", default="tiny")
    p.add_argument("--weights", default=None,
                   help="checkpoint path (npz/safetensors/flat-bin); "
                        "default seeded random weights")
    p.add_argument("--manifest", default=None,
                   help="JSONL of {audio, text}; omit for the offline A/B")
    p.add_argument("--clips", type=int, default=6)
    p.add_argument("--max-new", type=int, default=32)
    p.add_argument("--dtype", default="float32",
                   help="manifest mode: compute dtype")
    p.add_argument("--kv-quant", action="store_true")
    p.add_argument("--beam", type=int, default=1)
    p.add_argument("--variants", default=None,
                   help="comma list of A/B variant names to run "
                        "(fp32_greedy reference always included)")
    p.add_argument("--n-text-layers", type=int, default=None,
                   help="deep-decoder override for the divergence A/B "
                        "(sq rounding compounds per layer)")
    p.add_argument("--ref", default="fp32_greedy",
                   help="reference variant for the A/B (e.g. bf16_greedy "
                        "isolates a quant feature's own divergence from "
                        "the bf16-vs-fp32 dtype noise)")
    args = p.parse_args()
    if args.manifest:
        run_manifest(args)
    else:
        run_ab(args)


if __name__ == "__main__":
    main()
