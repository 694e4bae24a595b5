"""Chained multi-batch dispatch: G micro-batches per jitted program.

bench.py's chained throughput mode computes G micro-batches' stage1
(mel+encoder+prefill) in ONE program and dispatches each decode loop as its
own program — amortizing the axon tunnel's ~27 ms/program fixed dispatch
cost without losing the loop's own-program compilation win (DESIGN.md §19;
the lax.map-over-both-stages variant measured a definitive negative and
survives in benchmarks/chained_dispatch.py CHAIN_MODE=both). These tests
pin the contract that chained programs — both formulations — are token-
and logprob-identical to the eager split path (greedy_decode), per slot.

No reference counterpart (the reference transcribes one clip per process,
whisper.mojo:170-223); this is throughput-serving machinery.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from whisper_tpu.decode import _greedy_loop, _greedy_prefill, greedy_decode
from whisper_tpu.models.whisper import encoder_forward, init_params
from whisper_tpu.tokenizer import build_prompt


@pytest.fixture(scope="module")
def nano(small_cfg):
    # 2 s audio -> 200 mel frames -> 100 encoder positions (conv stride 2),
    # so the real audio->mel->encoder path works at nano scale
    cfg = small_cfg.replace(n_audio_ctx=100, n_text_ctx=48, chunk_length_s=2)
    params = init_params(cfg, jax.random.PRNGKey(0))
    return cfg, params


def test_chained_map_matches_eager_split(nano):
    cfg, params = nano
    B, G, NEW = 2, 3, 8
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    total = prompt.shape[1] + NEW
    mel = jnp.asarray(np.random.RandomState(0).randn(
        G, B, cfg.n_mels, 2 * cfg.n_audio_ctx).astype(np.float32))

    def stage1_one(m):
        enc = encoder_forward(params, cfg, m)
        return _greedy_prefill(params, cfg, enc, prompt, total)

    def loop_one(pre):
        cross, cache, tokens, logits = pre
        return _greedy_loop(params, cfg, cross, cache, tokens, logits,
                            prompt, None, jax.random.PRNGKey(0),
                            opts=None, max_new=NEW - 1)

    stage1_g = jax.jit(lambda mg: jax.lax.map(stage1_one, mg))
    loop_g = jax.jit(lambda pre: jax.lax.map(loop_one, pre))
    res = loop_g(stage1_g(mel))
    assert res.tokens.shape == (G, B, total)

    for g in range(G):
        enc = encoder_forward(params, cfg, mel[g])
        ref = greedy_decode(params, cfg, enc, prompt, max_new=NEW - 1)
        np.testing.assert_array_equal(np.asarray(ref.tokens),
                                      np.asarray(res.tokens[g]))
        np.testing.assert_allclose(np.asarray(ref.sum_logprobs),
                                   np.asarray(res.sum_logprobs[g]),
                                   atol=1e-5)


def test_bench_chained_runner_shapes(nano):
    """bench.py's stage1-chained runner returns G per-slot DecodeResults
    that are invariant to G (same audio in every slot)."""
    cfg, params = nano
    from bench import make_chained_runner  # repo-root bench.py

    B, NEW = 2, 6
    prompt = jnp.asarray(np.tile(build_prompt(cfg), (B, 1)), jnp.int32)
    audio1 = jnp.asarray(np.random.RandomState(1).randn(
        1, B, cfg.n_samples).astype(np.float32) * 0.1)
    audio3 = jnp.concatenate([audio1, audio1, audio1], axis=0)

    run1 = make_chained_runner(cfg, params, prompt, gen_tokens=NEW, G=1)
    run3 = make_chained_runner(cfg, params, prompt, gen_tokens=NEW, G=3)
    (r1,) = run1(audio1)
    r3 = run3(audio3)
    assert len(r3) == 3
    assert r3[0].tokens.shape == (B, prompt.shape[1] + NEW)
    for g in range(3):
        np.testing.assert_array_equal(np.asarray(r1.tokens),
                                      np.asarray(r3[g].tokens))
