"""Checkpoint formats: npz round-trip, safetensors, orbax (incl. sharded)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from whisper_tpu.models.whisper import init_params
from whisper_tpu.weights import (
    from_safetensors,
    load_npz,
    load_orbax,
    save_npz,
    save_orbax,
)


@pytest.fixture(scope="module")
def nano_cfg():
    from whisper_tpu.config import get_config
    return get_config("tiny").replace(
        name="ckpt-nano", d_model=64, n_heads=2,
        n_audio_layers=1, n_text_layers=1,
        n_audio_ctx=8, n_text_ctx=8, vocab_size=256,
        n_mels=4, eot_token=250, n_languages=2)


def _assert_trees_equal(a, b):
    la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_npz_roundtrip(tmp_path, nano_cfg):
    params = init_params(nano_cfg, jax.random.PRNGKey(0))
    save_npz(str(tmp_path / "w.npz"), params)
    _assert_trees_equal(params, load_npz(str(tmp_path / "w.npz"), nano_cfg))


def test_orbax_roundtrip(tmp_path, nano_cfg):
    params = init_params(nano_cfg, jax.random.PRNGKey(1))
    save_orbax(str(tmp_path / "ckpt"), params)
    _assert_trees_equal(params, load_orbax(str(tmp_path / "ckpt"), nano_cfg))


def test_orbax_sharded_restore(tmp_path, nano_cfg):
    """Restore directly into tp shardings on the 8-device test mesh."""
    from whisper_tpu.parallel.mesh import make_mesh
    params = init_params(nano_cfg, jax.random.PRNGKey(2))
    save_orbax(str(tmp_path / "ckpt"), params)
    mesh = make_mesh(dp=4, tp=2)
    restored = load_orbax(str(tmp_path / "ckpt"), nano_cfg, mesh=mesh)
    _assert_trees_equal(params, restored)
    qw = restored["encoder"]["layers"]["attn"]["q"]["w"]
    assert "tp" in str(qw.sharding.spec)


def test_safetensors_loads_hf_layout(tmp_path, nano_cfg):
    """Write an HF-shaped safetensors file and load it without torch."""
    from safetensors.numpy import save_file

    cfg = nano_cfg
    rng = np.random.RandomState(0)
    d, ff, nm = cfg.d_model, cfg.d_ff, cfg.n_mels

    def lin(out_f, in_f, bias=True):
        t = {"weight": rng.randn(out_f, in_f).astype(np.float32)}
        if bias:
            t["bias"] = rng.randn(out_f).astype(np.float32)
        return t

    state = {}

    def put(prefix, tensors):
        for k, v in tensors.items():
            state[f"{prefix}.{k}"] = v

    put("model.encoder.conv1", {"weight": rng.randn(d, nm, 3).astype(np.float32),
                                "bias": rng.randn(d).astype(np.float32)})
    put("model.encoder.conv2", {"weight": rng.randn(d, d, 3).astype(np.float32),
                                "bias": rng.randn(d).astype(np.float32)})
    state["model.encoder.embed_positions.weight"] = \
        rng.randn(cfg.n_audio_ctx, d).astype(np.float32)
    for i in range(cfg.n_audio_layers):
        p = f"model.encoder.layers.{i}"
        put(f"{p}.self_attn.q_proj", lin(d, d))
        put(f"{p}.self_attn.k_proj", lin(d, d, bias=False))
        put(f"{p}.self_attn.v_proj", lin(d, d))
        put(f"{p}.self_attn.out_proj", lin(d, d))
        state[f"{p}.self_attn_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        state[f"{p}.self_attn_layer_norm.bias"] = rng.randn(d).astype(np.float32)
        put(f"{p}.fc1", lin(ff, d))
        put(f"{p}.fc2", lin(d, ff))
        state[f"{p}.final_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        state[f"{p}.final_layer_norm.bias"] = rng.randn(d).astype(np.float32)
    state["model.encoder.layer_norm.weight"] = rng.randn(d).astype(np.float32)
    state["model.encoder.layer_norm.bias"] = rng.randn(d).astype(np.float32)
    state["model.decoder.embed_tokens.weight"] = \
        rng.randn(cfg.vocab_size, d).astype(np.float32)
    state["model.decoder.embed_positions.weight"] = \
        rng.randn(cfg.n_text_ctx, d).astype(np.float32)
    for i in range(cfg.n_text_layers):
        p = f"model.decoder.layers.{i}"
        put(f"{p}.self_attn.q_proj", lin(d, d))
        put(f"{p}.self_attn.k_proj", lin(d, d, bias=False))
        put(f"{p}.self_attn.v_proj", lin(d, d))
        put(f"{p}.self_attn.out_proj", lin(d, d))
        state[f"{p}.self_attn_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        state[f"{p}.self_attn_layer_norm.bias"] = rng.randn(d).astype(np.float32)
        put(f"{p}.encoder_attn.q_proj", lin(d, d))
        put(f"{p}.encoder_attn.k_proj", lin(d, d, bias=False))
        put(f"{p}.encoder_attn.v_proj", lin(d, d))
        put(f"{p}.encoder_attn.out_proj", lin(d, d))
        state[f"{p}.encoder_attn_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        state[f"{p}.encoder_attn_layer_norm.bias"] = rng.randn(d).astype(np.float32)
        put(f"{p}.fc1", lin(ff, d))
        put(f"{p}.fc2", lin(d, ff))
        state[f"{p}.final_layer_norm.weight"] = rng.randn(d).astype(np.float32)
        state[f"{p}.final_layer_norm.bias"] = rng.randn(d).astype(np.float32)
    state["model.decoder.layer_norm.weight"] = rng.randn(d).astype(np.float32)
    state["model.decoder.layer_norm.bias"] = rng.randn(d).astype(np.float32)

    path = str(tmp_path / "model.safetensors")
    save_file(state, path)
    params = from_safetensors(path, cfg)
    # weights transposed (out,in)->(in,out); spot-check one
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["layers"]["fc1"]["w"][0]),
        state["model.encoder.layers.0.fc1.weight"].T)
    # k bias slot exists and is zeros
    assert np.all(np.asarray(params["decoder"]["layers"]["attn"]["k"]["b"]) == 0)
