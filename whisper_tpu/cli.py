"""Command-line transcription entry point (replaces reference main.mojo).

Usage:
    python -m whisper_tpu.cli --audio clip.wav --weights w.npz --model tiny
    python -m whisper_tpu.cli --mel sample_input.bin \
        --flat-bin whisper_tiny_weights.bin            # reference artifacts

Unlike the reference (filenames hardcoded at main.mojo:16-24, zero flags),
everything is a flag: model size, weight format, language, task, input kind.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax

# The axon TPU plugin's sitecustomize force-sets jax_platforms="axon,cpu",
# silently overriding a user's JAX_PLATFORMS=cpu. Honor the documented env
# var semantics: an explicit JAX_PLATFORMS wins.
_env_platforms = os.environ.get("JAX_PLATFORMS", "").strip()
if _env_platforms:
    try:
        jax.config.update("jax_platforms", _env_platforms)
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="whisper_tpu", description=__doc__)
    p.add_argument("--model", default="tiny")
    p.add_argument("--weights", help="npz checkpoint (named arrays)")
    p.add_argument("--flat-bin", help="reference-format flat fp32 weight blob")
    p.add_argument("--random-weights", action="store_true",
                   help="random init (benchmarks without a checkpoint)")
    p.add_argument("--audio", help="input WAV file")
    p.add_argument("--mel", help="precomputed mel .bin "
                   "(n_mels x n_frames fp32, reference sample_input.bin)")
    p.add_argument("--vocab", help="vocab.txt path (default: bundled asset)")
    p.add_argument("--language", default="en")
    p.add_argument("--task", default="transcribe",
                   choices=["transcribe", "translate"])
    p.add_argument("--reference-detok", action="store_true",
                   help="use the reference's lossy Ġ/\\n detokenizer")
    p.add_argument("--max-new", type=int, default=None,
                   help="cap on generated tokens (default: reference's 195)")
    p.add_argument("--beam", type=int, default=1, help="beam size (1=greedy)")
    p.add_argument("--temperature", type=float, default=0.0,
                   help=">0 enables sampling")
    p.add_argument("--timestamps", action="store_true",
                   help="decode with timestamp tokens + timestamp rules")
    p.add_argument("--suppress-nonspeech", action="store_true",
                   help="suppress the standard non-speech token set")
    p.add_argument("--condition-on-previous", action="store_true",
                   help="long-form: condition each window on previous text")
    p.add_argument("--word-timestamps", action="store_true",
                   help="emit per-word timings (cross-attention DTW)")
    p.add_argument("--output-format", choices=["text", "srt", "vtt", "tsv",
                                               "json"], default="text")
    p.add_argument("--output", help="write the formatted transcript here "
                   "(default: stdout)")
    p.add_argument("--dtype", choices=["float32", "bfloat16"],
                   default=None,
                   help="compute dtype: float32 = token-parity mode "
                        "(default), bfloat16 = serving mode (in-place-"
                        "append decode step, ~2x RTFx — DESIGN.md §20)")
    p.add_argument("--kv-quant", action="store_true",
                   help="int8 KV cache (fused dequant kernel on TPU)")
    p.add_argument("--self-kv-quant", action="store_true",
                   help="scale-commuted int8 SELF cache (bf16 serving "
                        "mode only; DESIGN.md §35 — the §29 commute "
                        "applied to the decode loop's other cache read)")
    p.add_argument("--cross-kv-quant", action="store_true",
                   help="int8 CROSS cache only (self stays bf16): halves "
                        "the dominant per-step decode read via the scale-"
                        "commuted formulation — e2e win at every family "
                        "size (DESIGN.md §29); on by default in bf16 mode")
    p.add_argument("--no-quant", action="store_true",
                   help="disable the bf16 serving default of weight-only "
                        "int8 + int8 cross-KV (DESIGN.md §29); explicit "
                        "--*-quant flags also suppress the auto default")
    p.add_argument("--draft-model", default=None,
                   help="enable speculative decoding with this family "
                        "member as the draft (same vocab required, e.g. "
                        "base drafts large-v2, turbo drafts large-v3); "
                        "tokens are exactly the target's greedy output. "
                        "A batch-1 latency feature: base->large-v2 k=4 "
                        "breaks even at 46%% draft agreement, 1.8x at "
                        "80%% (DESIGN.md §33)")
    p.add_argument("--draft-weights", default=None,
                   help="npz checkpoint for the draft model")
    p.add_argument("--draft-flat-bin", default=None,
                   help="flat-bin weights for the draft model")
    p.add_argument("--draft-k", type=int, default=4,
                   help="draft tokens proposed per verify round")
    p.add_argument("--weight-quant", action="store_true",
                   help="weight-only int8 on the decoder's per-step "
                        "weights (bf16 mode only): the dequant fuses into "
                        "the matmul reads — a LATENCY win at medium/large "
                        "where weights are 0.8-1.6 GB/step (DESIGN.md §28)")
    p.add_argument("--seed", type=int, default=0, help="sampling seed")
    p.add_argument("--vad-db", type=float, default=None, metavar="DB",
                   help="energy VAD gate: skip 30 s windows whose frames "
                        "never exceed this dBFS (e.g. -40); silent windows "
                        "cost zero compute")
    p.add_argument("--no-speech-threshold", type=float, default=None,
                   metavar="P", help="drop a window's text when "
                        "P(<|nospeech|>) exceeds P and avg logprob is low "
                        "(openai semantics)")
    args = p.parse_args(argv)

    from whisper_tpu.config import get_config
    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.tokenizer import build_prompt

    cfg = get_config(args.model)
    if args.dtype:
        cfg = cfg.replace(compute_dtype=args.dtype)
    if args.kv_quant:
        cfg = cfg.replace(kv_cache_quant=True)
    if args.cross_kv_quant:
        cfg = cfg.replace(cross_kv_quant=True)
    if args.self_kv_quant:
        cfg = cfg.replace(self_kv_quant=True)
    if args.weight_quant:
        cfg = cfg.replace(weight_quant=True)
    quant = "off" if args.no_quant else "auto"
    # the CLI transcribes one file at a time, so effective decode rows =
    # beam width (1 for greedy): below the quant break-even at tiny
    # width, the auto policy keeps quant off there (DESIGN.md §29b/§37;
    # explicit --*-quant flags still win)
    rows = max(1, args.beam)
    if args.flat_bin:
        pipe = WhisperPipeline.from_flat_bin(args.flat_bin, cfg, args.vocab,
                                             quant=quant, batch_hint=rows)
    elif args.weights:
        pipe = WhisperPipeline.from_npz(args.weights, cfg, quant=quant,
                                        batch_hint=rows)
    elif args.random_weights:
        pipe = WhisperPipeline.from_random(cfg, quant=quant, batch_hint=rows)
    else:
        p.error("need one of --weights / --flat-bin / --random-weights")
    cfg = pipe.cfg  # auto-quant may have added serving flags

    mel_opts = None
    if args.beam > 1 or args.temperature > 0 or args.timestamps \
            or args.suppress_nonspeech:
        mel_opts = pipe.make_options(
            timestamps=args.timestamps,
            suppress_nonspeech=args.suppress_nonspeech,
            temperature=args.temperature, beam_size=args.beam)

    if args.mel:
        mel = np.fromfile(args.mel, dtype="<f4").reshape(cfg.n_mels, cfg.n_frames)
        from whisper_tpu.decode import transcribe_tokens
        import time
        prompt = jnp.asarray(
            [build_prompt(cfg, args.language, args.task,
                          timestamps=args.timestamps)], jnp.int32)
        rng = (jax.random.PRNGKey(args.seed) if args.temperature > 0 else None)
        t0 = time.perf_counter()
        res = transcribe_tokens(pipe.params, cfg, jnp.asarray(mel)[None], prompt,
                                max_new=args.max_new, opts=mel_opts,
                                beam_size=args.beam, rng=rng)
        res.tokens.block_until_ready()
        dt = time.perf_counter() - t0
        n = int(res.lengths[0])
        ids = np.asarray(res.tokens)[0, :n].tolist()
        text = (pipe.tokenizer.decode_reference(ids) if args.reference_detok
                else pipe.tokenizer.decode(ids))
        print(f"transcribe: {dt:.3f}s (incl. first-call compile)")
        print("tokens:", ids)
        print("text:", text)
        return 0

    if not args.audio:
        p.error("need --audio or --mel")
    from whisper_tpu.native import load_audio
    opts = mel_opts
    wav = load_audio(args.audio, cfg.sample_rate)

    if args.draft_model:
        # speculative greedy: draft proposes --draft-k tokens per target
        # verify; output tokens are exactly the target's greedy output
        # (whisper_tpu/speculative.py; single <=30 s window, greedy only)
        from whisper_tpu.speculative import spec_transcribe_window
        if args.beam > 1 or args.temperature > 0 or mel_opts is not None:
            p.error("--draft-model supports plain greedy only "
                    "(no beam/temperature/timestamps rules)")
        if cfg.self_kv_quant:
            # speculative_decode normalizes sq OFF (exact-greedy contract
            # vs the multi-token verify window, DESIGN.md §35); surface
            # the strip rather than silently ignoring the flag/default
            print("warning: --draft-model runs with self_kv_quant "
                  "disabled (speculative verify requires the bf16 self "
                  "cache); tokens match sq-OFF greedy", file=sys.stderr)
        if len(wav) > cfg.n_samples:
            p.error("--draft-model currently transcribes one <=30 s window")
        d_cfg = get_config(args.draft_model).replace(
            compute_dtype=cfg.compute_dtype)
        if args.draft_flat_bin:
            draft = WhisperPipeline.from_flat_bin(args.draft_flat_bin,
                                                  d_cfg, args.vocab,
                                                  quant=quant)
        elif args.draft_weights:
            draft = WhisperPipeline.from_npz(args.draft_weights, d_cfg,
                                             quant=quant)
        elif args.random_weights:
            draft = WhisperPipeline.from_random(d_cfg, seed=3, quant=quant)
        else:
            p.error("--draft-model needs --draft-weights / --draft-flat-bin "
                    "(or --random-weights)")
        r = spec_transcribe_window(pipe, draft, wav, args.language,
                                   args.task, max_new=args.max_new,
                                   k=args.draft_k)
        print(f"timings: {r.timings}")
        print("tokens:", r.tokens)
        print("text:", r.text)
        return 0

    r = pipe.transcribe(wav, args.language, args.task, max_new=args.max_new,
                        opts=opts,
                        condition_on_previous=args.condition_on_previous,
                        word_timestamps=args.word_timestamps,
                        no_speech_threshold=args.no_speech_threshold,
                        vad_threshold_db=args.vad_db)
    print(f"timings: {r.timings}")
    print("tokens:", r.tokens)
    print("text:", r.text)
    if r.segments:
        for s in r.segments:
            end = "?" if s["end"] is None else f"{s['end']:.2f}"
            print(f"[{s['start']:.2f} -> {end}] {s['text']}")
    if r.words:
        print("words:", " ".join(
            f"{w.word.strip()}[{w.start:.2f}-{w.end:.2f}]" for w in r.words))

    if args.output_format != "text" or args.output:
        from whisper_tpu import formats
        segs = r.segments or (formats.words_to_segments(r.words)
                              if r.words else
                              [{"start": 0.0, "end": len(wav) / cfg.sample_rate,
                                "text": r.text}])
        rendered = {
            "text": r.text,
            "srt": formats.to_srt(segs),
            "vtt": formats.to_vtt(segs),
            "tsv": formats.to_tsv(segs),
            "json": formats.to_json(r.text, r.segments, r.words,
                                    language=args.language),
        }[args.output_format]
        if args.output:
            with open(args.output, "w", encoding="utf-8") as f:
                f.write(rendered + "\n")
        else:
            print(rendered)
    return 0


if __name__ == "__main__":
    sys.exit(main())
