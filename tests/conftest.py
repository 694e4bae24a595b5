"""Test harness configuration.

Tests run on CPU with 8 virtual XLA devices so that multi-chip sharding
logic is exercised without TPU hardware (the repo's "fake backend", per
SURVEY.md §4's implication — the reference has no test harness at all).
Env vars must be set before jax initializes its backends.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin's sitecustomize force-overrides jax_platforms to
# "axon,cpu" regardless of JAX_PLATFORMS; re-pin to cpu so tests run on the
# 8-device virtual CPU mesh, not over the single-chip TPU tunnel.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# ---------------------------------------------------------------------------
# XLA-CPU memory-map guard (round-5 triage of the full-suite segfault).
#
# Symptom: `python -m pytest tests/ -q` deterministically SEGFAULTED at
# ~85% (inside backend_compile_and_load, jax/_src/compiler.py:362) while
# every module passed in isolation. Cause, measured via /proc/self/maps
# polling: each XLA-CPU JIT LoadedExecutable holds multiple anonymous
# mappings (code pages + guard pages), jax's global jit caches never
# evict, and the suite's thousands of compiled programs accumulate to the
# kernel's vm.max_map_count ceiling (65530 here) — the crash sampled at
# maps=63845 ten seconds before death, and the failed mmap is unhandled
# in XLA. jax.clear_caches()+gc reclaims almost everything (one
# kernel-heavy module: 3962 maps -> 561), so a threshold guard keeps the
# process comfortably below the ceiling at the cost of recompiling
# whatever later tests still need. 40k leaves >20k headroom over the
# largest observed single-module growth (~4k).
# ---------------------------------------------------------------------------
_MAPS_SOFT_CAP = 40_000


def _proc_maps_count() -> int:
    try:
        with open("/proc/self/maps") as f:
            return sum(1 for _ in f)
    except OSError:          # non-Linux: no /proc, no ceiling to guard
        return 0


@pytest.fixture(autouse=True)
def _xla_map_guard():
    yield
    if _proc_maps_count() > _MAPS_SOFT_CAP:
        import gc
        jax.clear_caches()
        gc.collect()


@pytest.fixture(scope="session")
def tiny_cfg():
    from whisper_tpu.config import get_config
    return get_config("tiny")


@pytest.fixture(scope="session")
def small_cfg():
    """A scaled-down config for fast parity tests (same structure as tiny,
    fewer parameters). Special-token layout kept identical to tiny so prompt
    logic is exercised unchanged."""
    from whisper_tpu.config import get_config
    return get_config("tiny").replace(
        name="test-nano", d_model=64, n_heads=2,
        n_audio_layers=2, n_text_layers=2,
        n_audio_ctx=1500, n_text_ctx=448,
    )


@pytest.fixture(scope="session")
def torch_tiny():
    """Seeded random-init HF whisper-tiny (torch). Session-scoped: model
    construction is expensive."""
    torch = pytest.importorskip("torch")
    from transformers import WhisperConfig as HFConfig
    from transformers import WhisperForConditionalGeneration

    torch.manual_seed(0)
    hf = HFConfig(vocab_size=51_865, num_mel_bins=80, d_model=384,
                  encoder_layers=4, encoder_attention_heads=6,
                  decoder_layers=4, decoder_attention_heads=6,
                  encoder_ffn_dim=1536, decoder_ffn_dim=1536,
                  max_source_positions=1500, max_target_positions=448,
                  activation_function="gelu")
    return WhisperForConditionalGeneration(hf).eval()


@pytest.fixture(scope="session")
def tiny_params(torch_tiny, tiny_cfg):
    from whisper_tpu.weights import from_hf_state_dict, to_device
    return to_device(from_hf_state_dict(torch_tiny.state_dict(), tiny_cfg))


@pytest.fixture(scope="session")
def mel_fixture(tiny_cfg):
    rng = np.random.RandomState(0)
    return (rng.randn(1, tiny_cfg.n_mels, tiny_cfg.n_frames) * 0.5).astype(np.float32)
