"""Continuous batching: lockstep engine semantics and isolation.

Key invariant: a request's tokens do not depend on which slot it occupies,
what else shares the batch, or when it arrives — per-row math is
row-independent, so results must be *exactly* equal across schedules."""

import numpy as np
import jax
import pytest

from whisper_tpu.models.whisper import init_params
from whisper_tpu.serving_continuous import ContinuousBatcher


@pytest.fixture(scope="module")
def nano():
    from whisper_tpu.config import get_config
    cfg = get_config("tiny").replace(
        name="cont-nano", d_model=64, n_heads=2,
        n_audio_layers=2, n_text_layers=2,
        n_audio_ctx=1500, n_text_ctx=448)
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def _audio(seed, seconds=1.5):
    rng = np.random.RandomState(seed)
    return (rng.randn(int(seconds * 16_000)) * 0.1).astype(np.float32)


def test_single_request_completes(nano):
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=6)
    rid = eng.submit(_audio(0))
    out = eng.run_until_idle()
    ids = out[rid]
    assert ids[0] == cfg.sot_token
    assert ids[:4] == [50258, 50259, 50359, 50363]
    assert len(ids) <= 4 + 1 + 6
    assert isinstance(eng.decode_text(rid), str)


def test_schedule_independence(nano):
    """Same audio -> same tokens regardless of slot, arrival order, and
    batch companions."""
    cfg, params = nano
    solo = ContinuousBatcher(params, cfg, max_slots=1, max_new=6)
    r0 = solo.submit(_audio(42))
    ref = solo.run_until_idle()[r0]

    crowd = ContinuousBatcher(params, cfg, max_slots=3, max_new=6)
    others = [crowd.submit(_audio(s)) for s in (1, 2)]
    mine = crowd.submit(_audio(42))          # lands in the last slot
    late = crowd.submit(_audio(3))           # queued, joins when a slot frees
    out = crowd.run_until_idle()
    assert out[mine] == ref
    for rid in (*others, late):
        assert out[rid][0] == cfg.sot_token


def test_slots_are_reused(nano):
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=4)
    rids = [eng.submit(_audio(s)) for s in range(5)]
    out = eng.run_until_idle()
    assert set(out) == set(rids)
    for rid in rids:
        assert out[rid][:4] == [50258, 50259, 50359, 50363]


def test_auto_language_resolves_at_slot_fill(nano):
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=1, max_new=3)
    rid = eng.submit(_audio(5), language="auto")
    out = eng.run_until_idle()
    lang_tok = out[rid][1]
    assert (cfg.first_language_token <= lang_tok
            < cfg.first_language_token + cfg.n_languages)


def test_callbacks_fire(nano):
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=3)
    got = {}
    eng.submit(_audio(7), callback=lambda rid, ids: got.update({rid: ids}))
    out = eng.run_until_idle()
    assert got == out


def test_streaming_tokens_match_final(nano):
    """on_token streams exactly the generated suffix, in order."""
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=5)
    streamed: list[int] = []
    rid = eng.submit(_audio(11),
                     on_token=lambda r, t: streamed.append(t))
    out = eng.run_until_idle()
    P = 4                               # [sot, lang, task, notimestamps]
    assert streamed == out[rid][P:]
    assert len(streamed) >= 1


def test_cap_terminates(nano):
    """Even when the model never emits EOT (random weights may not), the
    per-request cap finishes every slot."""
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=3)
    rids = [eng.submit(_audio(s)) for s in range(2)]
    out = eng.run_until_idle(max_steps=200)
    for rid in rids:
        assert len(out[rid]) <= 4 + 1 + 3
