"""Pinned-output regression fixtures for the rules/beam/sampling decode
paths (VERDICT r1 Next #3: the raw-greedy seeded golden gate was the only
pinned anchor; these extend it to every decode configuration the CLI
exposes).

Fixture provenance: seed-7 random tiny weights + the deterministic 330 Hz
clip (the same pair as tests/test_golden_seeded.py and the verify skill),
decoded on CPU fp32. Regenerate with tools/gen_pinned_fixtures.py after an
*intentional* numerics change; an unintentional one trips these gates.

What each case anchors:
  * timestamps  — the full timestamp grammar (ts/text alternation rules,
                  max_initial_timestamp, monotonicity; decode_rules.py)
  * beam3       — beam search with rules: per-hop cache gather, EOT
                  freezing, length-normalized ranking (decode.py:155)
  * suppress    — explicit suppress_tokens + suppress_blank: the raw-greedy
                  winners (37836, 5553) are banned, forcing the next-best
                  path, so the suppression mask provably reached the logits
  * sample_t07  — temperature sampling with a pinned PRNG key
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.audio import log_mel_spectrogram
from whisper_tpu.config import get_config
from whisper_tpu.decode import beam_decode, encode, greedy_decode
from whisper_tpu.decode_rules import DecodeOptions
from whisper_tpu.models.whisper import init_params
from whisper_tpu.tokenizer import build_prompt

SEED, HZ = 7, 330.0

PINNED = {
    "timestamps": [50258, 50259, 50359, 50413, 51406, 44666, 51772, 51772,
                   44666, 51822, 51822, 44666, 51837, 51837, 47148, 51857,
                   51857, 47752, 47752, 47752],
    "beam3": [50258, 50259, 50359, 50363, 7588, 7588, 7588, 7588, 7588,
              7588, 7588, 7588, 7588, 5457, 5457, 5457, 5457],
    "suppress": [50258, 50259, 50359, 50363, 7588, 7588, 7588, 7588, 7588,
                 7588, 7588, 7588, 7588, 7588, 7588, 7588, 7588],
    "sample_t07": [50258, 50259, 50359, 50363, 20410, 41954, 14872, 18518,
                   19909, 43860, 6482, 20066, 30164, 19276, 26304, 44075,
                   45403],
}

CASES = {
    "timestamps": dict(opts=DecodeOptions(timestamps=True,
                                          suppress_blank=True),
                       max_new=16, timestamps=True),
    "beam3": dict(opts=DecodeOptions(beam_size=3), max_new=12),
    "suppress": dict(opts=DecodeOptions(suppress_tokens=(37836, 5553),
                                        suppress_blank=True), max_new=12),
    "sample_t07": dict(opts=DecodeOptions(temperature=0.7), max_new=12,
                       rng=True),
}


@pytest.fixture(scope="module")
def enc_and_params():
    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.PRNGKey(SEED))
    t = np.arange(cfg.n_samples) / cfg.sample_rate
    audio = (0.4 * np.sin(2 * np.pi * HZ * t)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio)[None], cfg)
    return cfg, params, encode(params, cfg, mel)


@pytest.mark.parametrize("name", list(PINNED))
def test_pinned_decode_configuration(enc_and_params, name):
    cfg, params, enc = enc_and_params
    case = CASES[name]
    opts = case["opts"]
    prompt = jnp.asarray(
        [build_prompt(cfg, timestamps=case.get("timestamps", False))],
        jnp.int32)
    if opts.beam_size > 1:
        res = beam_decode(params, cfg, enc, prompt, beam_size=opts.beam_size,
                          max_new=case["max_new"], opts=opts)
    else:
        rng = jax.random.PRNGKey(0) if case.get("rng") else None
        res = greedy_decode(params, cfg, enc, prompt, max_new=case["max_new"],
                            opts=opts, rng=rng)
    got = np.asarray(res.tokens)[0, :int(res.lengths[0])].tolist()
    assert got == PINNED[name], (
        f"pinned fixture {name!r} drift:\n got {got}\n exp {PINNED[name]}")


def test_timestamp_fixture_obeys_grammar(enc_and_params):
    """Structural check so the fixture itself stays meaningful: the pinned
    timestamp sequence alternates <ts> text... <ts><ts> with monotonically
    nondecreasing timestamps (openai ApplyTimestampRules semantics)."""
    cfg, _, _ = enc_and_params
    ts0 = cfg.timestamp_begin
    seq = [t for t in PINNED["timestamps"][4:] if t != cfg.eot_token]
    ts = [t - ts0 for t in seq if t >= ts0]
    assert ts, "no timestamp tokens in the timestamps fixture"
    assert ts == sorted(ts), "timestamps must be monotonic"
    assert seq[0] >= ts0, "segment must open with a timestamp token"
