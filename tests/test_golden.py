"""Golden-token gate vs the reference's expected_tokens.txt.

The reference's north-star correctness claim is bit-identical greedy tokens
to PyTorch on sample_input.bin (readme.md:19, expected_tokens.txt). Real
whisper-tiny weights are not redistributable inside this repo and the build
environment has no network, so this test auto-skips unless the artifacts are
present. Provide them via:
  WHISPER_TPU_FLAT_BIN=.../whisper_tiny_weights.bin   (reference exporter fmt)
  WHISPER_TPU_MEL=.../sample_input.bin                (80x3000 fp32)
  WHISPER_TPU_EXPECTED=.../expected_tokens.txt        (defaults to reference's)
"""

import os
import re

import numpy as np
import pytest

EXPECTED_DEFAULT = "/root/reference/expected_tokens.txt"


def _parse_expected(path: str) -> list[int]:
    # file is a Python repr of a list of np.int64 (export_weights.py:123-131)
    return [int(m) for m in re.findall(r"np\.int64\((\d+)\)|(?<!\d)(\d+)(?!\d)",
                                       open(path).read())
            if m] or [int(x) for x in re.findall(r"\d+", open(path).read())]


def test_golden_tokens():
    bin_path = os.environ.get("WHISPER_TPU_FLAT_BIN", "whisper_tiny_weights.bin")
    mel_path = os.environ.get("WHISPER_TPU_MEL", "sample_input.bin")
    exp_path = os.environ.get("WHISPER_TPU_EXPECTED", EXPECTED_DEFAULT)
    if not (os.path.exists(bin_path) and os.path.exists(mel_path)):
        pytest.skip("real whisper-tiny weights/mel not available "
                    "(no network in build env)")

    import jax.numpy as jnp
    from whisper_tpu.config import get_config
    from whisper_tpu.decode import transcribe_tokens
    from whisper_tpu.tokenizer import build_prompt
    from whisper_tpu.weights import from_flat_bin, to_device

    cfg = get_config("tiny")
    params = to_device(from_flat_bin(open(bin_path, "rb").read(), cfg))
    mel = np.fromfile(mel_path, dtype="<f4").reshape(1, cfg.n_mels, cfg.n_frames)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    res = transcribe_tokens(params, cfg, jnp.asarray(mel), prompt)
    got = np.asarray(res.tokens)[0][:int(res.lengths[0])].tolist()

    expected = _parse_expected(exp_path)
    # expected_tokens.txt holds generated ids (prompt excluded)
    gen = got[prompt.shape[1]:]
    assert gen == expected, f"token mismatch:\n got {gen}\n exp {expected}"
