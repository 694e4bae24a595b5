"""Self-contained golden-token regression gate.

The reference's correctness anchor is a committed golden token list
(expected_tokens.txt) regenerated from real weights — unavailable here
(no network; see tests/test_golden.py for the real-weights gate). This is
the self-contained analogue: seeded random weights + a deterministic
synthetic clip must reproduce a committed token sequence exactly, end to
end (mel frontend -> encoder -> prefill -> greedy loop -> lengths). Any
accidental numerics change anywhere in the pipeline flips a near-tie
argmax and trips this gate.

The same (seed 7, 330 Hz) fixture is used by the verify skill's CLI drive,
and has been confirmed token-identical on: CPU fp32 XLA, TPU fp32 with
Pallas kernels, TPU bf16 auto, and TPU int8-cache paths (see git history).
"""

import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.audio import log_mel_spectrogram
from whisper_tpu.config import get_config
from whisper_tpu.decode import transcribe_tokens
from whisper_tpu.models.whisper import init_params
from whisper_tpu.tokenizer import build_prompt

# generated on CPU fp32 (jax 0.9.0); prompt + 12-token greedy continuation
GOLDEN_SEED = 7
GOLDEN_HZ = 330.0
GOLDEN_TOKENS = [50258, 50259, 50359, 50363,
                 37836, 37836, 37836, 37836, 37836, 37836, 37836, 37836,
                 37836, 37836, 5553, 5553, 5553]


def test_seeded_golden_tokens():
    cfg = get_config("tiny")
    params = init_params(cfg, jax.random.PRNGKey(GOLDEN_SEED))
    t = np.arange(cfg.n_samples) / cfg.sample_rate
    audio = (0.4 * np.sin(2 * np.pi * GOLDEN_HZ * t)).astype(np.float32)
    mel = log_mel_spectrogram(jnp.asarray(audio)[None], cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    res = transcribe_tokens(params, cfg, mel, prompt, max_new=12)
    got = np.asarray(res.tokens)[0, :int(res.lengths[0])].tolist()
    assert got == GOLDEN_TOKENS, f"golden drift:\n got {got}\n exp {GOLDEN_TOKENS}"
    # the quality signals are finite and sane
    assert 0.0 <= float(np.asarray(res.no_speech_prob)[0]) <= 1.0
    assert np.isfinite(float(np.asarray(res.sum_logprobs)[0]))
