"""Speculative decoding: exact greedy-equivalence contract.

The whole point of `speculative_decode` is that it is a DISPATCH
optimization, not an approximation: for any draft model, output tokens
must be bit-identical to greedy decode on the target alone. These tests
pin that across draft quality (target-as-draft = full acceptance,
cross-seed draft = partial acceptance, fresh-random draft = near-zero
acceptance), EOT handling, batching, and the pair-compatibility check.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.decode import greedy_decode
from whisper_tpu.models.whisper import encoder_forward, init_params
from whisper_tpu.speculative import speculative_decode
from whisper_tpu.tokenizer import build_prompt


@pytest.fixture(scope="module")
def pair(small_cfg):
    """Target: the 2-layer d64 nano. Draft: a 1-layer d48 nano sharing the
    token space (the vocab/special-token contract _check_pair enforces)."""
    t_cfg = small_cfg
    d_cfg = small_cfg.replace(name="spec-draft-nano", d_model=48,
                              n_heads=2, n_audio_layers=1, n_text_layers=1)
    t_params = init_params(t_cfg, jax.random.PRNGKey(0))
    d_params = init_params(d_cfg, jax.random.PRNGKey(3))
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(2, 80, t_cfg.n_frames).astype(np.float32)
                        * 0.4)
    # both models consume the same mel here (same n_mels in the pair)
    t_enc = encoder_forward(t_params, t_cfg, audio)
    d_enc = encoder_forward(d_params, d_cfg, audio)
    prompt = jnp.asarray(np.tile(build_prompt(t_cfg), (2, 1)), jnp.int32)
    return t_cfg, d_cfg, t_params, d_params, t_enc, d_enc, prompt


def _bias(cfg, ban_eot=True):
    b = jnp.zeros((cfg.vocab_size,), jnp.float32)
    return b.at[cfg.eot_token].set(-1e9) if ban_eot else b


def _assert_matches_greedy(pair_data, d_params, d_cfg, d_enc, k, max_new,
                           bias):
    t_cfg, _, t_params, _, t_enc, _, prompt = pair_data
    ref = greedy_decode(t_params, t_cfg, t_enc, prompt, max_new=max_new,
                        logit_bias=bias)
    got = speculative_decode(t_params, t_cfg, d_params, d_cfg,
                             t_enc, d_enc, prompt, max_new=max_new, k=k,
                             logit_bias=bias)
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
    np.testing.assert_array_equal(np.asarray(got.lengths),
                                  np.asarray(ref.lengths))
    np.testing.assert_allclose(np.asarray(got.no_speech_prob),
                               np.asarray(ref.no_speech_prob), atol=1e-5)
    np.testing.assert_allclose(np.asarray(got.sum_logprobs),
                               np.asarray(ref.sum_logprobs),
                               rtol=1e-4, atol=1e-4)


def test_cross_seed_draft_matches_greedy(pair):
    t_cfg, d_cfg, _, d_params, _, d_enc, _ = pair
    _assert_matches_greedy(pair, d_params, d_cfg, d_enc, k=3, max_new=16,
                           bias=_bias(t_cfg))


def test_target_as_draft_matches_greedy(pair):
    """Perfect draft (the target itself): every window fully accepted."""
    t_cfg, _, t_params, _, t_enc, _, _ = pair
    _assert_matches_greedy(pair, t_params, t_cfg, t_enc, k=4, max_new=17,
                           bias=_bias(t_cfg))


def test_perfect_draft_round_count_is_minimal(pair):
    """The draft-cache completeness invariant, pinned behaviorally: with
    the TARGET as its own draft every window must be fully accepted, so
    the verify-round count is exactly ceil(max_new / (k+1)). A hole in
    the draft cache after a fully-accepted round (the d_k row at q+k was
    once never written) degrades acceptance from round 2 on and inflates
    this count — tokens stay exact either way, so only the stats see it."""
    t_cfg, _, t_params, _, t_enc, _, prompt = pair
    k, max_new = 4, 17
    _, stats = speculative_decode(
        t_params, t_cfg, t_params, t_cfg, t_enc, t_enc, prompt,
        max_new=max_new, k=k, logit_bias=_bias(t_cfg), return_stats=True)
    assert int(stats["rounds"]) == -(-max_new // (k + 1))  # == 4
    # every round fully accepted -> k drafts per round
    assert int(stats["accepted_drafts"]) == int(stats["rounds"]) * k


def test_hostile_draft_matches_greedy(pair):
    """A draft with no predictive power (fresh random weights) degrades
    throughput, never tokens."""
    t_cfg, d_cfg, _, _, _, _, _ = pair
    d_params = init_params(d_cfg, jax.random.PRNGKey(99))
    rng = np.random.RandomState(7)
    d_enc = encoder_forward(
        d_params, d_cfg,
        jnp.asarray(rng.randn(2, 80, d_cfg.n_frames).astype(np.float32)))
    _assert_matches_greedy(pair, d_params, d_cfg, d_enc, k=2, max_new=11,
                           bias=_bias(t_cfg))


def test_eot_path_matches_greedy(pair):
    """No EOT ban: rows may finish early inside a window; lengths and
    trailing EOT padding must still match greedy exactly."""
    t_cfg, d_cfg, _, d_params, _, d_enc, _ = pair
    _assert_matches_greedy(pair, d_params, d_cfg, d_enc, k=3, max_new=16,
                           bias=None)


def test_k1_and_wide_k(pair):
    t_cfg, d_cfg, _, d_params, _, d_enc, _ = pair
    _assert_matches_greedy(pair, d_params, d_cfg, d_enc, k=1, max_new=9,
                           bias=_bias(t_cfg))
    _assert_matches_greedy(pair, d_params, d_cfg, d_enc, k=8, max_new=13,
                           bias=_bias(t_cfg))


def test_pair_mismatch_rejected(small_cfg):
    from whisper_tpu.config import get_config
    t_cfg = get_config("large-v3")   # 51,866 vocab, shifted tokens
    with pytest.raises(ValueError, match="vocab_size"):
        speculative_decode(None, t_cfg, None, small_cfg,
                           None, None, jnp.zeros((1, 4), jnp.int32))


def test_k_validation(pair):
    t_cfg, d_cfg, t_params, d_params, t_enc, d_enc, prompt = pair
    with pytest.raises(ValueError, match="k must be"):
        speculative_decode(t_params, t_cfg, d_params, d_cfg,
                           t_enc, d_enc, prompt, max_new=4, k=0)


def test_spec_transcribe_window_matches_pipeline(small_cfg):
    """Pipeline-level wrapper: same tokens as target.transcribe_window."""
    from whisper_tpu.pipeline import WhisperPipeline
    from whisper_tpu.speculative import spec_transcribe_window

    d_cfg = small_cfg.replace(name="spec-draft-nano", d_model=48,
                              n_heads=2, n_audio_layers=1, n_text_layers=1)
    t = WhisperPipeline.from_random(small_cfg, seed=0)
    d = WhisperPipeline.from_random(d_cfg, seed=3)
    audio = (np.random.RandomState(0).randn(16000) * 0.1).astype(np.float32)
    got = spec_transcribe_window(t, d, audio, max_new=8, k=3)
    ref = t.transcribe_window(audio, max_new=8)
    assert got.tokens == ref.tokens
    assert got.text == ref.text


def test_sq_target_normalized_to_bf16_cache(pair):
    """A target cfg carrying self_kv_quant (the §35 serving default at
    d_model>=1024, e.g. large-v2) is normalized OFF inside
    speculative_decode: sq's commuted single-token arithmetic rounds
    differently from the multi-token verify window, so keeping it would
    break the exact-greedy contract. Output must equal greedy on the
    sq-stripped cfg — and the sq-flagged call must not crash or allocate
    int8 caches."""
    t_cfg, d_cfg, t_params, d_params, _, _, prompt = pair
    t_bf = t_cfg.replace(compute_dtype="bfloat16", self_kv_quant=True)
    d_bf = d_cfg.replace(compute_dtype="bfloat16")
    cast = lambda p: jax.tree.map(  # noqa: E731
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)
    t_params, d_params = cast(t_params), cast(d_params)
    rng = np.random.RandomState(0)
    audio = jnp.asarray(rng.randn(2, 80, t_cfg.n_frames).astype(np.float32)
                        * 0.4)
    t_enc = encoder_forward(t_params, t_bf, audio)
    d_enc = encoder_forward(d_params, d_bf, audio)
    ref = greedy_decode(t_params, t_bf.replace(self_kv_quant=False),
                        t_enc, prompt, max_new=12, logit_bias=_bias(t_cfg))
    got = speculative_decode(t_params, t_bf, d_params, d_bf,
                             t_enc, d_enc, prompt, max_new=12, k=3,
                             logit_bias=_bias(t_cfg))
    np.testing.assert_array_equal(np.asarray(got.tokens),
                                  np.asarray(ref.tokens))
