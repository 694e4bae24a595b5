"""Export reference-format artifacts from an HF Whisper checkpoint.

Role parity with the reference's offline tooling (export_weights.py:11-155):
given a *local* HF checkpoint (no network in most build environments), emit

  whisper_<model>_weights.bin  — the headerless positional fp32 blob
                                 (SURVEY.md §2.5 byte contract)
  sample_input.bin             — (n_mels x n_frames) fp32 log-mel of a WAV,
                                 computed by THIS framework's frontend
  expected_tokens.txt          — greedy token ids from this engine
                                 (optionally cross-checked against torch)
  vocab.txt                    — id-ordered vocab table (vocab.txt contract:
                                 one token per line, id = line-1, newlines
                                 escaped as the literal two characters \\n)

Usage:
  python tools/export_artifacts.py --checkpoint /path/to/hf-whisper-tiny \
      --model tiny --audio clip.wav [--out-dir artifacts] [--torch-check]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="local HF checkpoint dir (safetensors or torch bin)")
    p.add_argument("--model", default="tiny")
    p.add_argument("--audio", help="WAV to build sample_input/expected_tokens")
    p.add_argument("--out-dir", default=".")
    p.add_argument("--torch-check", action="store_true",
                   help="also run HF torch generate and assert token match")
    args = p.parse_args()

    from whisper_tpu.config import get_config
    from whisper_tpu import weights as W

    cfg = get_config(args.model)
    os.makedirs(args.out_dir, exist_ok=True)

    st_path = os.path.join(args.checkpoint, "model.safetensors")
    if os.path.exists(st_path):
        params = W.from_safetensors(st_path, cfg)
    else:
        import torch
        from transformers import WhisperForConditionalGeneration
        model = WhisperForConditionalGeneration.from_pretrained(args.checkpoint)
        params = W.from_hf_state_dict(model.state_dict(), cfg)

    bin_path = os.path.join(args.out_dir,
                            f"whisper_{args.model}_weights.bin")
    with open(bin_path, "wb") as f:
        f.write(W.to_flat_bin(params, cfg))
    print(f"wrote {bin_path} ({os.path.getsize(bin_path)/1e6:.1f} MB)")

    # vocab table, when the checkpoint ships a tokenizer
    try:
        from transformers import WhisperTokenizer
        tok = WhisperTokenizer.from_pretrained(args.checkpoint)
        vocab = sorted(tok.get_vocab().items(), key=lambda kv: kv[1])
        vpath = os.path.join(args.out_dir, "vocab.txt")
        with open(vpath, "w", encoding="utf-8") as f:
            for s, _ in vocab:
                f.write(s.replace("\n", "\\n") + "\n")
        print(f"wrote {vpath} ({len(vocab)} tokens)")
    except Exception as e:                                # tokenizer optional
        print(f"vocab export skipped: {e}")

    if not args.audio:
        return 0

    import jax
    import jax.numpy as jnp
    from whisper_tpu.audio import log_mel_spectrogram, pad_or_trim
    from whisper_tpu.decode import transcribe_tokens
    from whisper_tpu.native import load_audio
    from whisper_tpu.tokenizer import build_prompt

    wav = load_audio(args.audio, cfg.sample_rate)
    mel = np.asarray(log_mel_spectrogram(
        jnp.asarray(pad_or_trim(wav, cfg.n_samples))[None], cfg))[0]
    mel_path = os.path.join(args.out_dir, "sample_input.bin")
    mel.astype("<f4").tofile(mel_path)
    print(f"wrote {mel_path} {mel.shape}")

    dev_params = W.to_device(params)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    res = transcribe_tokens(dev_params, cfg, jnp.asarray(mel)[None], prompt)
    n = int(res.lengths[0])
    gen = np.asarray(res.tokens)[0, prompt.shape[1]:n].tolist()
    tpath = os.path.join(args.out_dir, "expected_tokens.txt")
    with open(tpath, "w") as f:
        f.write(repr(gen) + "\n")
    print(f"wrote {tpath} ({len(gen)} tokens)")

    if args.torch_check:
        import torch
        from transformers import WhisperForConditionalGeneration
        model = WhisperForConditionalGeneration.from_pretrained(
            args.checkpoint).eval()
        with torch.no_grad():
            out = model.generate(torch.from_numpy(mel[None]),
                                 do_sample=False, num_beams=1)
        ref = out[0].tolist()
        ref_gen = ref[len(build_prompt(cfg)):]
        status = "MATCH" if ref_gen == gen else "MISMATCH"
        print(f"torch cross-check: {status}")
        if status == "MISMATCH":
            print(" torch:", ref_gen[:20])
            print("  ours:", gen[:20])
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
