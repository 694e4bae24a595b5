"""Regenerate the pinned decode fixtures in tests/test_golden_pinned.py.

Run on CPU (deterministic across sessions for a fixed jax version):
    JAX_PLATFORMS=cpu python tools/gen_pinned_fixtures.py

Prints a PINNED dict literal to paste into the test. The fixtures extend the
raw-greedy seeded golden gate (tests/test_golden_seeded.py) to the rules /
beam / sampling / timestamp decode paths — VERDICT r1 Next #3: every decode
configuration the CLI exposes gets a committed expected sequence.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")

from whisper_tpu.audio import log_mel_spectrogram  # noqa: E402
from whisper_tpu.config import get_config  # noqa: E402
from whisper_tpu.decode import beam_decode, encode, greedy_decode  # noqa: E402
from whisper_tpu.decode_rules import DecodeOptions  # noqa: E402
from whisper_tpu.models.whisper import init_params  # noqa: E402
from whisper_tpu.tokenizer import build_prompt  # noqa: E402

SEED, HZ = 7, 330.0


def main() -> None:
    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.PRNGKey(SEED))
    t = np.arange(cfg.n_samples) / cfg.sample_rate
    audio = (0.4 * np.sin(2 * np.pi * HZ * t)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio)[None], cfg)
    enc = encode(params, cfg, mel)

    cases = {}

    def run(name, opts, *, max_new, timestamps=False, rng=None):
        prompt = jnp.asarray(
            [build_prompt(cfg, timestamps=timestamps)], jnp.int32)
        if opts.beam_size > 1:
            res = beam_decode(params, cfg, enc, prompt,
                              beam_size=opts.beam_size, max_new=max_new,
                              opts=opts)
        else:
            res = greedy_decode(params, cfg, enc, prompt, max_new=max_new,
                                opts=opts, rng=rng)
        ids = np.asarray(res.tokens)[0, :int(res.lengths[0])].tolist()
        cases[name] = ids

    run("timestamps",
        DecodeOptions(timestamps=True, suppress_blank=True),
        max_new=16, timestamps=True)
    run("beam3",
        DecodeOptions(beam_size=3),
        max_new=12)
    run("suppress",
        DecodeOptions(suppress_tokens=(37836, 5553), suppress_blank=True),
        max_new=12)
    run("sample_t07",
        DecodeOptions(temperature=0.7),
        max_new=12, rng=jax.random.PRNGKey(0))

    print("PINNED = {")
    for k, v in cases.items():
        print(f"    {k!r}: {v},")
    print("}")


if __name__ == "__main__":
    main()
