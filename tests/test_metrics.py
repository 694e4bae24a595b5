"""WER/CER metrics (whisper_tpu/utils/metrics.py) and the roofline cost
model (utils/perf_model.py) — pure-host math, no model required."""

import pytest

from whisper_tpu.config import get_config
from whisper_tpu.utils.metrics import (
    cer,
    edit_distance,
    normalize_text,
    token_er,
    wer,
)
from whisper_tpu.utils.perf_model import (
    V5E_HBM_BYTES_PER_S,
    V5E_PEAK_BF16_FLOPS,
    decode_cost,
    workload_cost,
)


class TestEditDistance:
    def test_identity(self):
        assert edit_distance(list("kitten"), list("kitten")) == 0

    def test_classic(self):
        assert edit_distance(list("kitten"), list("sitting")) == 3
        assert edit_distance(list("flaw"), list("lawn")) == 2

    def test_empty(self):
        assert edit_distance([], list("abc")) == 3
        assert edit_distance(list("abc"), []) == 3
        assert edit_distance([], []) == 0

    def test_words(self):
        assert edit_distance("a b c".split(), "a x c d".split()) == 2

    def test_symmetry(self):
        a, b = list("abcdef"), list("azced")
        assert edit_distance(a, b) == edit_distance(b, a)


class TestWerCer:
    def test_perfect(self):
        assert wer("hello world", "hello world") == 0.0
        assert cer("hello", "hello") == 0.0

    def test_one_sub(self):
        assert wer("the cat sat", "the dog sat") == pytest.approx(1 / 3)

    def test_insert_delete(self):
        assert wer("a b c d", "a b d") == pytest.approx(1 / 4)
        assert wer("a b d", "a b c d") == pytest.approx(1 / 3)

    def test_normalization(self):
        assert normalize_text("Hello,   World!") == "hello world"
        assert wer("Hello, World!", "hello world") == 0.0
        assert wer("Hello, World!", "hello world", normalize=False) > 0.0

    def test_empty_ref(self):
        assert wer("", "") == 0.0
        assert wer("", "something") == 1.0
        assert cer("", "x") == 1.0

    def test_token_er(self):
        assert token_er([1, 2, 3], [1, 2, 3]) == 0.0
        assert token_er([1, 2, 3], [1, 9, 3]) == pytest.approx(1 / 3)
        assert token_er([], []) == 0.0


class TestPerfModel:
    def test_workload_positive_and_ordered(self):
        cfg = get_config("tiny").replace(compute_dtype="bfloat16")
        c8 = workload_cost(cfg, 8, 4, 89)
        c32 = workload_cost(cfg, 32, 4, 89)
        assert c8.flops > 0 and c8.hbm_bytes > 0 and c8.floor_s > 0
        # batch scales FLOPs ~linearly but shares per-step weight reads
        assert 3.5 < c32.flops / c8.flops < 4.5
        assert c32.hbm_bytes < 4 * c8.hbm_bytes

    def test_decode_is_bandwidth_bound_at_tiny(self):
        cfg = get_config("tiny").replace(compute_dtype="bfloat16")
        fl, by = decode_cost(cfg, 8, 4, 88, 2)
        assert by / V5E_HBM_BYTES_PER_S > fl / V5E_PEAK_BF16_FLOPS

    def test_kv_quant_lowers_bytes(self):
        cfg = get_config("tiny").replace(compute_dtype="bfloat16")
        plain = workload_cost(cfg, 8, 4, 89)
        quant = workload_cost(cfg.replace(kv_cache_quant=True), 8, 4, 89)
        assert quant.hbm_bytes < plain.hbm_bytes

    def test_mfu_and_sol_sanity(self):
        cfg = get_config("tiny").replace(compute_dtype="bfloat16")
        c = workload_cost(cfg, 32, 4, 89)
        # measured round-1 headline: ~0.22 s for the b32 workload
        assert 0.0 < c.mfu(0.22) < 0.2          # tiny is bandwidth-bound
        assert 0.0 < c.sol_frac(0.22) <= 1.0
