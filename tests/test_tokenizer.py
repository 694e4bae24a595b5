"""Tokenizer: vocab contract, reference detok parity, prompt construction."""

import pytest

from whisper_tpu.config import get_config
from whisper_tpu.tokenizer import Tokenizer, build_prompt, language_token


@pytest.fixture(scope="module")
def tok():
    return Tokenizer()


def test_vocab_size(tok):
    assert tok.vocab_size == 51_865


def test_special_token_strings(tok):
    c = get_config("tiny")
    assert tok.id_to_token(c.eot_token) == "<|endoftext|>"
    assert tok.id_to_token(c.sot_token) == "<|startoftranscript|>"
    assert tok.id_to_token(c.first_language_token) == "<|en|>"
    assert tok.id_to_token(c.transcribe_token) == "<|transcribe|>"
    assert tok.id_to_token(c.no_timestamps_token) == "<|notimestamps|>"
    assert tok.id_to_token(c.timestamp_begin) == "<|0.00|>"


def test_reference_prompt_ids():
    # reference whisper.mojo:188-191: [50258, 50259, 50359, 50363]
    c = get_config("tiny")
    assert build_prompt(c, "en", "transcribe") == [50258, 50259, 50359, 50363]


def test_prompt_variants():
    c = get_config("tiny")
    assert build_prompt(c, "de", "translate") == [50258, 50261, 50358, 50363]
    assert build_prompt(c, "en", "transcribe", timestamps=True) == \
        [50258, 50259, 50359]
    with pytest.raises(ValueError):
        language_token(c, "yue")  # 100th language absent in 99-lang vocab
    assert language_token(get_config("large-v3"), "yue") == 50_358


def test_reference_decode_semantics(tok):
    # reference tokenizer.mojo:15-28: drop specials, Ġ->space, \n literal ->
    # newline. Golden-token prefix from expected_tokens.txt: 639="This",
    # 307=" is", 452=" my", 3177=" cou..." etc — check behavior not content.
    c = get_config("tiny")
    ids = [c.sot_token, 639, 307, c.eot_token]
    out = tok.decode_reference(ids)
    assert "<|" not in out
    assert out == tok.tokens[639].replace("Ġ", " ") + \
        tok.tokens[307].replace("Ġ", " ")


def test_byte_decode_roundtrip(tok):
    # GPT-2 byte decode must agree with reference decode on pure-ASCII tokens
    ids = [639, 307, 452, 3177, 322, 264, 1411, 13]
    assert tok.decode(ids) == tok.decode_reference(ids)


def test_byte_decode_handles_multibyte(tok):
    # find a token with bytes >= 0x80 (multibyte utf-8 pieces exist in vocab)
    s = tok.decode([12509])  # arbitrary id; must not raise
    assert isinstance(s, str)
