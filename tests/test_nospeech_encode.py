"""no-speech detection signal + greedy text encoder."""

import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.whisper import encoder_forward, init_params
from whisper_tpu.tokenizer import Tokenizer, build_prompt


def test_no_speech_prob_returned(small_cfg):
    cfg = small_cfg
    params = init_params(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (2, cfg.n_mels, cfg.n_frames)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)
    res = greedy_decode(params, cfg, enc, prompt, max_new=3)
    nsp = np.asarray(res.no_speech_prob)
    assert nsp.shape == (2,)
    assert ((nsp >= 0) & (nsp <= 1)).all()


def test_no_speech_prob_with_prev_prefix(small_cfg):
    """SOT is offset when a <|startofprev|> prefix is present; the signal
    must still be read at the SOT position."""
    cfg = small_cfg
    params = init_params(cfg, jax.random.PRNGKey(0))
    mel = jax.random.normal(jax.random.PRNGKey(1),
                            (1, cfg.n_mels, cfg.n_frames)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    plain = jnp.asarray([build_prompt(cfg)], jnp.int32)
    with_prev = jnp.asarray([build_prompt(cfg, prev_tokens=(100, 200))],
                            jnp.int32)
    r1 = greedy_decode(params, cfg, enc, plain, max_new=2)
    r2 = greedy_decode(params, cfg, enc, with_prev, max_new=2)
    # both are probabilities; prefix changes context so values differ, but
    # both must be valid (the gather must hit SOT, not <|startofprev|>)
    for r in (r1, r2):
        v = float(np.asarray(r.no_speech_prob)[0])
        assert 0.0 <= v <= 1.0


def test_encode_greedy_roundtrip(tiny_cfg):
    tok = Tokenizer(config=tiny_cfg)
    for text in (" Hello world.", " the quick brown fox",
                 " Schöne Grüße", " 你好"):
        ids = tok.encode_greedy(text)
        assert ids, text
        assert tok.decode(ids) == text, text
        # no special tokens ever produced
        assert all(t < tiny_cfg.eot_token for t in ids)


def test_encode_greedy_never_emits_specials(tiny_cfg):
    tok = Tokenizer(config=tiny_cfg)
    ids = tok.encode_greedy("<|endoftext|>")
    assert tiny_cfg.eot_token not in ids
    assert tok.decode(ids) == "<|endoftext|>"   # as literal text
