"""Logit rules, temperature sampling, and beam search semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from whisper_tpu.decode import beam_decode, greedy_decode, transcribe_tokens
from whisper_tpu.decode_rules import (
    NEG,
    DecodeOptions,
    apply_rules,
    non_speech_tokens,
)
from whisper_tpu.models.whisper import encoder_forward, init_params
from whisper_tpu.tokenizer import Tokenizer, build_prompt


def _setup(cfg, batch=1, seed=0):
    params = init_params(cfg, jax.random.PRNGKey(seed))
    mel = jax.random.normal(jax.random.PRNGKey(seed + 1),
                            (batch, cfg.n_mels, cfg.n_frames)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    return params, mel, enc


# ---------------------------------------------------------------------------
# rules
# ---------------------------------------------------------------------------

def test_suppress_tokens_bias(tiny_cfg):
    opts = DecodeOptions(suppress_tokens=(5, 17), suppress_blank=False)
    logits = jnp.zeros((2, tiny_cfg.vocab_size))
    tokens = jnp.zeros((2, 10), jnp.int32)
    out = apply_rules(logits, tokens, jnp.int32(4), 4, tiny_cfg, opts)
    assert float(out[0, 5]) <= NEG / 2 and float(out[0, 17]) <= NEG / 2
    assert float(out[0, 6]) == 0.0
    # timestamps suppressed when opts.timestamps is False
    assert float(out[0, tiny_cfg.timestamp_begin]) <= NEG / 2


def test_suppress_blank_only_at_first_position(tiny_cfg):
    opts = DecodeOptions(suppress_blank=True)
    logits = jnp.zeros((1, tiny_cfg.vocab_size))
    tokens = jnp.zeros((1, 10), jnp.int32)
    first = apply_rules(logits, tokens, jnp.int32(4), 4, tiny_cfg, opts)
    later = apply_rules(logits, tokens, jnp.int32(5), 4, tiny_cfg, opts)
    assert float(first[0, 220]) <= NEG / 2            # "Ġ" banned at start
    assert float(first[0, tiny_cfg.eot_token]) <= NEG / 2
    assert float(later[0, 220]) == 0.0
    assert float(later[0, tiny_cfg.eot_token]) == 0.0


def test_timestamp_rules_pairing_and_monotonicity(tiny_cfg):
    cfg = tiny_cfg
    ts0 = cfg.timestamp_begin
    opts = DecodeOptions(timestamps=True, suppress_blank=False,
                         max_initial_timestamp_index=None)
    V = cfg.vocab_size
    P = 4

    # after exactly one trailing timestamp: text must be suppressed
    tokens = jnp.asarray([[50258, 50259, 50359, 50364, ts0 + 10, 0, 0]],
                         jnp.int32)
    out = apply_rules(jnp.zeros((1, V)), tokens, jnp.int32(P + 1), P, cfg, opts)
    assert float(out[0, 100]) <= NEG / 2              # text banned
    assert float(out[0, ts0 + 10]) > NEG / 2          # same timestamp ok

    # after two trailing timestamps: timestamps suppressed
    tokens2 = jnp.asarray([[50258, 50259, 50359, 50364, ts0 + 10, ts0 + 10, 0]],
                          jnp.int32)
    out2 = apply_rules(jnp.zeros((1, V)), tokens2, jnp.int32(P + 2), P, cfg,
                       opts)
    assert float(out2[0, ts0 + 20]) <= NEG / 2
    # monotonicity: timestamps below the running max banned even for text step
    assert float(out2[0, ts0 + 5]) <= NEG / 2


def test_timestamp_first_token_must_be_timestamp(tiny_cfg):
    cfg = tiny_cfg
    opts = DecodeOptions(timestamps=True, suppress_blank=False,
                         max_initial_timestamp_index=50)
    V = cfg.vocab_size
    tokens = jnp.zeros((1, 8), jnp.int32)
    out = apply_rules(jnp.zeros((1, V)), tokens, jnp.int32(4), 4, cfg, opts)
    assert float(out[0, 100]) <= NEG / 2                         # text banned
    assert float(out[0, cfg.timestamp_begin]) > NEG / 2          # <|0.00|> ok
    assert float(out[0, cfg.timestamp_begin + 51]) <= NEG / 2    # beyond cap


def test_non_speech_tokens_includes_structural_specials(tiny_cfg):
    tok = Tokenizer(config=tiny_cfg)
    ids = non_speech_tokens(tiny_cfg, tok)
    assert tiny_cfg.sot_token in ids
    assert tiny_cfg.no_timestamps_token in ids
    assert tiny_cfg.eot_token not in ids
    # at least some punctuation symbols resolved from the vocab
    assert len(ids) > 110


# ---------------------------------------------------------------------------
# strategies
# ---------------------------------------------------------------------------

def test_temperature_zero_matches_greedy(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    base = greedy_decode(params, cfg, enc, prompt, max_new=8)
    with_opts = greedy_decode(params, cfg, enc, prompt, max_new=8,
                              opts=DecodeOptions(suppress_blank=False),
                              rng=jax.random.PRNGKey(3))
    np.testing.assert_array_equal(np.asarray(base.tokens),
                                  np.asarray(with_opts.tokens))


def test_temperature_sampling_is_seeded_and_varies(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    opts = DecodeOptions(temperature=1.0, suppress_blank=False)
    a = greedy_decode(params, cfg, enc, prompt, max_new=8, opts=opts,
                      rng=jax.random.PRNGKey(0))
    b = greedy_decode(params, cfg, enc, prompt, max_new=8, opts=opts,
                      rng=jax.random.PRNGKey(0))
    c = greedy_decode(params, cfg, enc, prompt, max_new=8, opts=opts,
                      rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(a.tokens), np.asarray(b.tokens))
    assert not np.array_equal(np.asarray(a.tokens), np.asarray(c.tokens))


def test_beam_size_one_matches_greedy(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    g = greedy_decode(params, cfg, enc, prompt, max_new=8)
    b = beam_decode(params, cfg, enc, prompt, beam_size=1, max_new=8)
    ng, nb = int(g.lengths[0]), int(b.lengths[0])
    assert ng == nb
    assert np.asarray(g.tokens)[0, :ng].tolist() == \
        np.asarray(b.tokens)[0, :nb].tolist()


def test_beam_search_score_not_worse_than_greedy(small_cfg):
    """The best beam's total logprob must be >= the greedy path's logprob
    (beam search explores a superset)."""
    cfg = small_cfg
    params, _, enc = _setup(cfg, seed=2)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    g1 = beam_decode(params, cfg, enc, prompt, beam_size=1, max_new=6)
    b4 = beam_decode(params, cfg, enc, prompt, beam_size=4, max_new=6)
    assert float(b4.sum_logprobs[0]) >= float(g1.sum_logprobs[0]) - 1e-4


def test_beam_batched_shapes(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg, batch=2, seed=1)
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (2, 1)), jnp.int32)
    res = beam_decode(params, cfg, enc, prompt, beam_size=3, max_new=5)
    P = prompt.shape[1]
    assert res.tokens.shape == (2, P + 1 + 5)
    assert res.lengths.shape == (2,)
    # prompt preserved on the winning beam
    assert np.asarray(res.tokens)[:, :P].tolist() == np.asarray(prompt).tolist()


def test_beam_with_rules(small_cfg):
    """Beam search composes with the logit-rule stack: suppressed tokens
    never appear on any returned beam."""
    cfg = small_cfg
    params, _, enc = _setup(cfg, seed=4)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    # find the unsuppressed greedy top token, then ban it
    base = beam_decode(params, cfg, enc, prompt, beam_size=2, max_new=4)
    banned = int(np.asarray(base.tokens)[0, prompt.shape[1]])
    opts = DecodeOptions(suppress_tokens=(banned,), suppress_blank=False)
    res = beam_decode(params, cfg, enc, prompt, beam_size=2, max_new=4,
                      opts=opts)
    gen = np.asarray(res.tokens)[0, prompt.shape[1]:].tolist()
    assert banned not in gen


def test_transcribe_tokens_beam_path(small_cfg):
    cfg = small_cfg
    params, mel, _ = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    res = transcribe_tokens(params, cfg, mel, prompt, max_new=5, beam_size=2)
    assert res.tokens.shape == (1, prompt.shape[1] + 1 + 5)


def test_timestamp_closed_pair_forces_strictly_increasing(tiny_cfg):
    """openai ApplyTimestampRules: once a timestamp pair closed, the next
    timestamp must be strictly greater (nonzero-length segments)."""
    cfg = tiny_cfg
    ts0 = cfg.timestamp_begin
    opts = DecodeOptions(timestamps=True, suppress_blank=False,
                         max_initial_timestamp_index=None)
    V = cfg.vocab_size
    P = 4
    # closed pair (ts, ts) then a text token: the pair is closed
    tokens = jnp.asarray(
        [[50258, 50259, 50359, 50364, ts0 + 10, ts0 + 10, 100, 0]], jnp.int32)
    out = apply_rules(jnp.zeros((1, V)), tokens, jnp.int32(P + 3), P, cfg,
                      opts)
    assert float(out[0, ts0 + 10]) <= NEG / 2      # equal now banned
    assert float(out[0, ts0 + 11]) > NEG / 2       # strictly greater ok
    # open pair (single trailing ts): equal still allowed
    tokens2 = jnp.asarray(
        [[50258, 50259, 50359, 50364, 100, ts0 + 10, 0, 0]], jnp.int32)
    out2 = apply_rules(jnp.zeros((1, V)), tokens2, jnp.int32(P + 2), P, cfg,
                       opts)
    assert float(out2[0, ts0 + 10]) > NEG / 2


def test_timestamp_force_rule_suppresses_eot(tiny_cfg):
    """Rule 4 masks everything below timestamp_begin — EOT included
    (openai: logits[: timestamp_begin] = -inf)."""
    cfg = tiny_cfg
    ts0 = cfg.timestamp_begin
    opts = DecodeOptions(timestamps=True, suppress_blank=False,
                         max_initial_timestamp_index=None)
    V = cfg.vocab_size
    P = 4
    # mid-sequence (not first token), total timestamp mass dominant
    logits = jnp.zeros((1, V)).at[0, ts0:].set(5.0)
    tokens = jnp.asarray([[50258, 50259, 50359, 50364, 100, 0, 0]], jnp.int32)
    out = apply_rules(logits, tokens, jnp.int32(P + 1), P, cfg, opts)
    assert float(out[0, cfg.eot_token]) <= NEG / 2
    assert float(out[0, 100]) <= NEG / 2
    assert float(out[0, ts0 + 10]) > NEG / 2


def test_beam_reports_no_speech_prob(small_cfg):
    """beam_decode supplies no_speech_prob (the pipeline's silence gate
    requires it), matching greedy_decode's SOT-position softmax."""
    cfg = small_cfg
    params, _, enc = _setup(cfg, seed=5)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    g = greedy_decode(params, cfg, enc, prompt, max_new=4)
    b = beam_decode(params, cfg, enc, prompt, beam_size=3, max_new=4)
    assert b.no_speech_prob is not None
    np.testing.assert_allclose(np.asarray(b.no_speech_prob),
                               np.asarray(g.no_speech_prob), atol=1e-5)


def test_beam_rejects_temperature(small_cfg):
    cfg = small_cfg
    params, _, enc = _setup(cfg)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)
    opts = DecodeOptions(temperature=0.7)
    import pytest
    with pytest.raises(ValueError, match="beam"):
        beam_decode(params, cfg, enc, prompt, beam_size=2, max_new=4,
                    opts=opts)


def test_beam_under_serving_quant(small_cfg):
    """Beam search runs on the serving-quant stack (weight-only int8 +
    scale-commuted int8 cross, DESIGN.md §28-§29): beam-1 must equal
    greedy under the SAME quantized math, and beam-3 must be
    deterministic with a best score >= beam-1's."""
    from whisper_tpu.models.whisper import quantize_weights_wq
    from whisper_tpu.weights import to_device

    cfg = small_cfg.replace(compute_dtype="bfloat16",
                            weight_quant=True, cross_kv_quant=True)
    params = to_device(init_params(cfg, jax.random.PRNGKey(3)),
                       jnp.bfloat16)
    params = quantize_weights_wq(params, cfg)
    mel = jax.random.normal(jax.random.PRNGKey(4),
                            (1, cfg.n_mels, cfg.n_frames)) * 0.5
    enc = encoder_forward(params, cfg, mel)
    prompt = jnp.asarray([build_prompt(cfg)], jnp.int32)

    g = greedy_decode(params, cfg, enc, prompt, max_new=6)
    b1 = beam_decode(params, cfg, enc, prompt, beam_size=1, max_new=6)
    ng, nb = int(g.lengths[0]), int(b1.lengths[0])
    assert ng == nb
    assert np.asarray(g.tokens)[0, :ng].tolist() == \
        np.asarray(b1.tokens)[0, :nb].tolist()

    b3a = beam_decode(params, cfg, enc, prompt, beam_size=3, max_new=6)
    b3b = beam_decode(params, cfg, enc, prompt, beam_size=3, max_new=6)
    np.testing.assert_array_equal(np.asarray(b3a.tokens),
                                  np.asarray(b3b.tokens))
    assert float(b3a.sum_logprobs[0]) >= float(b1.sum_logprobs[0]) - 1e-4
