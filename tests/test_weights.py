"""Weight conversion: flat-bin byte contract round-trip, HF mapping, npz."""

import numpy as np
import jax
import pytest

from whisper_tpu.models.whisper import init_params
from whisper_tpu.weights import (
    from_flat_bin,
    from_hf_state_dict,
    load_npz,
    save_npz,
    to_flat_bin,
)


@pytest.fixture(scope="module")
def nano_params(small_cfg):
    return init_params(small_cfg, jax.random.PRNGKey(42))


def test_flat_bin_roundtrip(small_cfg, nano_params):
    """params -> reference byte contract (SURVEY.md §2.5) -> params is
    exact. Validates both the writer and the loader.mojo-compat reader."""
    blob = to_flat_bin(nano_params, small_cfg)
    # expected size: full param count minus k-biases (not serialized)
    n_floats = sum(np.asarray(x).size for x in jax.tree.leaves(nano_params))
    n_kbias = (small_cfg.n_audio_layers + 2 * small_cfg.n_text_layers) * small_cfg.d_model
    assert len(blob) == 4 * (n_floats - n_kbias)

    back = from_flat_bin(blob, small_cfg)
    for (kp1, a), (kp2, b) in zip(
            jax.tree_util.tree_flatten_with_path(nano_params)[0],
            jax.tree_util.tree_flatten_with_path(back)[0]):
        assert jax.tree_util.keystr(kp1) == jax.tree_util.keystr(kp2)
        if "'k'" in jax.tree_util.keystr(kp1) and "'b'" in jax.tree_util.keystr(kp1):
            assert np.all(np.asarray(b) == 0)   # k bias comes back as zeros
        else:
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_flat_bin_length_check(small_cfg, nano_params):
    blob = to_flat_bin(nano_params, small_cfg)
    with pytest.raises(ValueError):
        from_flat_bin(blob[:-8], small_cfg)      # truncated
    with pytest.raises(ValueError):
        from_flat_bin(blob + b"\x00" * 8, small_cfg)  # trailing floats


def test_npz_roundtrip(tmp_path, small_cfg, nano_params):
    path = str(tmp_path / "w.npz")
    save_npz(path, nano_params)
    back = load_npz(path, small_cfg)
    a = jax.tree.leaves(nano_params)
    b = jax.tree.leaves(back)
    assert len(a) == len(b)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_hf_mapping_shapes(torch_tiny, tiny_cfg):
    p = from_hf_state_dict(torch_tiny.state_dict(), tiny_cfg)
    d, ff, L = tiny_cfg.d_model, tiny_cfg.d_ff, tiny_cfg.n_text_layers
    assert p["encoder"]["conv1"]["w"].shape == (d, tiny_cfg.n_mels, 3)
    assert p["encoder"]["layers"]["fc1"]["w"].shape == (L, d, ff)
    assert p["decoder"]["layers"]["cross_attn"]["q"]["w"].shape == (L, d, d)
    assert p["decoder"]["tok_emb"].shape == (tiny_cfg.vocab_size, d)
    # k_proj bias slots are zero-filled
    assert np.all(p["decoder"]["layers"]["attn"]["k"]["b"] == 0)
