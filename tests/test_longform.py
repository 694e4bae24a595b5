"""Long-form semantics: <|startofprev|> token layout, echo-free window
conditioning, and the concurrent LongFormDriver vs the sequential
pipeline path."""

import jax
import numpy as np
import pytest

from whisper_tpu.models.whisper import init_params
from whisper_tpu.pipeline import WhisperPipeline
from whisper_tpu.serving_continuous import ContinuousBatcher
from whisper_tpu.serving_longform import LongFormDriver


@pytest.fixture(scope="module")
def nano():
    from whisper_tpu.config import get_config
    cfg = get_config("tiny").replace(
        name="lf-nano", d_model=64, n_heads=2,
        n_audio_layers=2, n_text_layers=2,
        n_audio_ctx=1500, n_text_ctx=448)
    return cfg, init_params(cfg, jax.random.PRNGKey(0))


def _audio(seed, seconds):
    rng = np.random.RandomState(seed)
    return (rng.randn(int(seconds * 16_000)) * 0.1).astype(np.float32)


def test_sot_prev_token_layout():
    """<|startofprev|> is 50361 (v2 vocab) / 50362 (large-v3's +1 language
    shift) — NOT sot+3=50261, which is the <|de|> language token (r3 bug:
    conditioning prompts carried a language token where the model expects
    <|startofprev|>)."""
    from whisper_tpu.config import get_config
    from whisper_tpu.tokenizer import build_prompt
    tiny = get_config("tiny")
    assert tiny.sot_prev_token == 50_361
    assert tiny.sot_prev_token != tiny.sot_token + 3
    v3 = get_config("large-v3")
    assert v3.sot_prev_token == 50_362
    ids = build_prompt(tiny, prev_tokens=(100, 200))
    assert ids[:3] == [50_361, 100, 200]


def test_sot_prev_matches_bundled_vocab():
    """The id must agree with the shipped vocab.txt (line = id + 1)."""
    import importlib.resources as ir

    from whisper_tpu.config import get_config
    cfg = get_config("tiny")
    path = ir.files("whisper_tpu") / "assets" / "vocab.txt"
    lines = path.read_text(encoding="utf-8").splitlines()
    assert lines[cfg.sot_prev_token] == "<|startofprev|>"


def test_conditioned_window_does_not_echo_prev_text(nano):
    """r3 regression: DecodeResult.tokens spans the full buffer including
    the <|startofprev|> text region; long-form transcribe used to decode
    that echo into every conditioned window's text."""
    cfg, params = nano
    pipe = WhisperPipeline(cfg, params)
    audio = _audio(0, 2 * cfg.chunk_length_s)     # exactly two windows
    solo_w1 = pipe.transcribe_window(
        audio[:cfg.n_samples], max_new=6)

    r = pipe.transcribe(audio, max_new=6, condition_on_previous=True)
    # window 2's conditioned output starts AFTER window 1's text — the
    # combined text contains window-1's text exactly once at the front
    assert r.text.startswith(solo_w1.text)
    assert r.text.count(solo_w1.text[:40]) == 1 if len(
        solo_w1.text) >= 40 else True
    # conditioned windows still begin their token stream at SOT, and the
    # 3 tokens after each SOT are the forced specials (lang/task/
    # notimestamps) — no prev-text tokens may sit in that region
    sots = [i for i, t in enumerate(r.tokens) if t == cfg.sot_token]
    assert len(sots) == 2
    for i in sots:
        assert all(t >= cfg.eot_token for t in r.tokens[i:i + 4])


def test_longform_driver_matches_pipeline(nano):
    """The concurrent driver chains windows with identical semantics to
    pipeline.transcribe (fixed 30 s advance, prev conditioning): same
    final text for the same audio."""
    cfg, params = nano
    pipe = WhisperPipeline(cfg, params)
    audio = _audio(3, 2 * cfg.chunk_length_s)
    ref = pipe.transcribe(audio, max_new=6, condition_on_previous=True)

    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=6)
    drv = LongFormDriver(eng, condition_on_previous=True)
    fid = drv.submit(audio)
    out = drv.run()[fid]
    assert out.windows == 2
    assert out.text == ref.text


def test_longform_driver_concurrent_files_are_isolated(nano):
    """Two long files interleaving in the slot batch each produce exactly
    the text they produce when run alone."""
    cfg, params = nano
    solos = []
    for seed in (11, 12):
        eng = ContinuousBatcher(params, cfg, max_slots=1, max_new=6)
        drv = LongFormDriver(eng, condition_on_previous=True)
        fid = drv.submit(_audio(seed, 2 * cfg.chunk_length_s))
        solos.append(drv.run()[fid].text)

    eng = ContinuousBatcher(params, cfg, max_slots=2, max_new=6)
    drv = LongFormDriver(eng, condition_on_previous=True)
    fids = [drv.submit(_audio(seed, 2 * cfg.chunk_length_s))
            for seed in (11, 12)]
    out = drv.run()
    assert [out[f].text for f in fids] == solos


def test_longform_tokens_contract_and_cancel(nano):
    """Result tokens keep each window's SOT-onward region (same contract
    as short requests: tokens[0] == SOT); cancel() stops the window
    chain and retain_results=False prunes per-file state."""
    cfg, params = nano
    eng = ContinuousBatcher(params, cfg, max_slots=1, max_new=6)
    drv = LongFormDriver(eng, retain_results=True)
    fid = drv.submit(_audio(5, 2 * cfg.chunk_length_s))
    out = drv.run()[fid]
    assert out.tokens[0] == cfg.sot_token
    assert out.tokens.count(cfg.sot_token) == out.windows == 2

    # cancel after the first window: chain must stop at 1 window
    eng2 = ContinuousBatcher(params, cfg, max_slots=1, max_new=6)
    drv2 = LongFormDriver(eng2, retain_results=False)
    seen = []
    fid2 = drv2.submit(_audio(6, 2 * cfg.chunk_length_s),
                       on_token=lambda f, t: (seen.append(t),
                                              drv2.cancel(f)))
    eng2.run_until_idle()
    assert seen                           # first window produced tokens
    assert fid2 not in drv2._files        # pruned after cancellation
    assert not eng2._queue                # no second window submitted
