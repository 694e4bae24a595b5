"""Checkpoint conversion and loading.

Replaces two reference components:
  * export_weights.py:17-92 — the HF -> flat-binary serializer. Here the
    converter goes HF state_dict -> *named, shaped* params pytree (the
    layout models/whisper.py consumes), stored as npz; no positional blob.
  * loader.mojo:5-31 — the headerless positional fp32 reader. A compat
    reader for that exact byte contract (SURVEY.md §2.5) is kept so
    checkpoints produced by the reference's exporter load directly, enabling
    cross-engine parity tests.

Layout transforms applied once at load (mirroring the reference's
load-time conv transpose, whisper.mojo:61-63):
  * linear weights (out, in) -> (in, out) so forward is x @ w;
  * k_proj bias slot filled with zeros (HF k_proj has no bias);
  * conv weights kept in torch OIH (out, in, k) for lax.conv.
"""

from __future__ import annotations

import io
from typing import Any, Callable, Mapping

import jax.numpy as jnp
import numpy as np

from whisper_tpu.config import WhisperConfig

Params = Any


# ---------------------------------------------------------------------------
# HF state_dict -> pytree
# ---------------------------------------------------------------------------

def _lin(get: Callable[[str], np.ndarray], prefix: str,
         has_bias: bool = True) -> dict:
    w = get(prefix + ".weight")          # (out, in)
    b = get(prefix + ".bias") if has_bias else np.zeros((w.shape[0],), np.float32)
    return {"w": np.ascontiguousarray(w.T), "b": b}


def _ln(get, prefix: str) -> dict:
    return {"g": get(prefix + ".weight"), "b": get(prefix + ".bias")}


def _attn(get, prefix: str) -> dict:
    return {
        "q": _lin(get, prefix + ".q_proj"),
        "k": _lin(get, prefix + ".k_proj", has_bias=False),
        "v": _lin(get, prefix + ".v_proj"),
        "o": _lin(get, prefix + ".out_proj"),
    }


def _stack_np(trees: list) -> Any:
    import jax
    return jax.tree.map(lambda *xs: np.stack(xs), *trees)


def from_hf_state_dict(state: Mapping[str, Any], cfg: WhisperConfig) -> Params:
    """Convert a HF WhisperForConditionalGeneration state_dict (torch tensors
    or numpy arrays) into the framework's params pytree (numpy, fp32)."""
    def get(name: str) -> np.ndarray:
        t = state[name]
        if hasattr(t, "detach"):
            t = t.detach().cpu().float().numpy()
        return np.asarray(t, dtype=np.float32)

    def enc_layer(i: int) -> dict:
        p = f"model.encoder.layers.{i}"
        return {
            "attn": _attn(get, p + ".self_attn"),
            "attn_ln": _ln(get, p + ".self_attn_layer_norm"),
            "fc1": _lin(get, p + ".fc1"),
            "fc2": _lin(get, p + ".fc2"),
            "mlp_ln": _ln(get, p + ".final_layer_norm"),
        }

    def dec_layer(i: int) -> dict:
        p = f"model.decoder.layers.{i}"
        return {
            "attn": _attn(get, p + ".self_attn"),
            "attn_ln": _ln(get, p + ".self_attn_layer_norm"),
            "cross_attn": _attn(get, p + ".encoder_attn"),
            "cross_ln": _ln(get, p + ".encoder_attn_layer_norm"),
            "fc1": _lin(get, p + ".fc1"),
            "fc2": _lin(get, p + ".fc2"),
            "mlp_ln": _ln(get, p + ".final_layer_norm"),
        }

    return {
        "encoder": {
            "conv1": {"w": get("model.encoder.conv1.weight"),
                      "b": get("model.encoder.conv1.bias")},
            "conv2": {"w": get("model.encoder.conv2.weight"),
                      "b": get("model.encoder.conv2.bias")},
            "pos_emb": get("model.encoder.embed_positions.weight"),
            "layers": _stack_np([enc_layer(i) for i in range(cfg.n_audio_layers)]),
            "ln_post": _ln(get, "model.encoder.layer_norm"),
        },
        "decoder": {
            "tok_emb": get("model.decoder.embed_tokens.weight"),
            "pos_emb": get("model.decoder.embed_positions.weight"),
            "layers": _stack_np([dec_layer(i) for i in range(cfg.n_text_layers)]),
            "ln": _ln(get, "model.decoder.layer_norm"),
        },
    }


# ---------------------------------------------------------------------------
# reference flat-binary compat reader (SURVEY.md §2.5 byte contract)
# ---------------------------------------------------------------------------

class FlatBinReader:
    """Sequential reader over the reference's headerless little-endian fp32
    stream (loader.mojo:5-31 semantics: no names, no shape check — order IS
    the contract)."""

    def __init__(self, data):
        if isinstance(data, np.ndarray):
            self.buf = data.view("<f4") if data.dtype != np.dtype("<f4") else data
        else:
            self.buf = np.frombuffer(data, dtype="<f4")
        self.pos = 0

    def take(self, *shape: int) -> np.ndarray:
        n = int(np.prod(shape))
        if self.pos + n > self.buf.size:
            raise ValueError(
                f"flat bin exhausted: need {n} floats at offset {self.pos}, "
                f"have {self.buf.size - self.pos}")
        out = self.buf[self.pos:self.pos + n].reshape(shape).copy()
        self.pos += n
        return out

    def done(self) -> bool:
        return self.pos == self.buf.size


def from_flat_bin_path(path: str, cfg: WhisperConfig) -> Params:
    """Zero-copy flat-bin load: mmap the file (native wn_mmap_open or
    np.memmap) and parse without reading 151 MB through Python first
    (the reference's loader reads + bitcasts the whole file, loader.mojo:10)."""
    from whisper_tpu.native import MappedWeights
    with MappedWeights(path) as m:
        try:
            return from_flat_bin(m.floats, cfg)
        except ValueError as e:
            raise ValueError(
                f"{path} does not match the {cfg.name!r} layout ({e}). "
                f"The flat-bin format is positional — pass the --model the "
                f"file was exported for.") from None


def from_flat_bin(data, cfg: WhisperConfig) -> Params:
    """Parse the reference's `whisper_tiny_weights.bin` layout
    (export_weights.py write order, SURVEY.md §2.5) into a params pytree.
    `data`: bytes or fp32 ndarray (e.g. an mmap view)."""
    r = FlatBinReader(data)
    d, ff, nm = cfg.d_model, cfg.d_ff, cfg.n_mels

    def lin(rows: int, cols: int, bias: bool = True) -> dict:
        w = r.take(rows, cols)           # (out, in)
        b = r.take(rows) if bias else np.zeros((rows,), np.float32)
        return {"w": np.ascontiguousarray(w.T), "b": b}

    def ln() -> dict:
        return {"g": r.take(d), "b": r.take(d)}

    def attn() -> dict:
        # write order q_w,q_b,k_w,v_w,v_b,out_w,out_b (export_weights.py:28-36)
        q = lin(d, d)
        k = lin(d, d, bias=False)
        v = lin(d, d)
        o = lin(d, d)
        return {"q": q, "k": k, "v": v, "o": o}

    def enc_layer() -> dict:
        a = attn()
        a_ln = ln()
        fc1 = lin(ff, d)
        fc2 = lin(d, ff)
        m_ln = ln()
        return {"attn": a, "attn_ln": a_ln, "fc1": fc1, "fc2": fc2,
                "mlp_ln": m_ln}

    def dec_layer() -> dict:
        a = attn()
        a_ln = ln()
        x = attn()
        x_ln = ln()
        fc1 = lin(ff, d)
        fc2 = lin(d, ff)
        m_ln = ln()
        return {"attn": a, "attn_ln": a_ln, "cross_attn": x, "cross_ln": x_ln,
                "fc1": fc1, "fc2": fc2, "mlp_ln": m_ln}

    conv1 = {"w": r.take(d, nm, 3), "b": r.take(d)}
    conv2 = {"w": r.take(d, d, 3), "b": r.take(d)}
    enc_pos = r.take(cfg.n_audio_ctx, d)
    enc_layers = _stack_np([enc_layer() for _ in range(cfg.n_audio_layers)])
    enc_ln = ln()
    tok_emb = r.take(cfg.vocab_size, d)
    dec_pos = r.take(cfg.n_text_ctx, d)
    dec_layers = _stack_np([dec_layer() for _ in range(cfg.n_text_layers)])
    dec_ln = ln()
    if not r.done():
        raise ValueError(f"flat bin has {r.buf.size - r.pos} unread floats")
    return {
        "encoder": {"conv1": conv1, "conv2": conv2, "pos_emb": enc_pos,
                    "layers": enc_layers, "ln_post": enc_ln},
        "decoder": {"tok_emb": tok_emb, "pos_emb": dec_pos,
                    "layers": dec_layers, "ln": dec_ln},
    }


def to_flat_bin(params: Params, cfg: WhisperConfig) -> bytes:
    """Inverse of from_flat_bin — writes the reference byte contract, for
    round-trip tests and for feeding the reference engine."""
    out = io.BytesIO()

    def w32(a: np.ndarray):
        out.write(np.ascontiguousarray(a, dtype="<f4").tobytes())

    def lin(p: dict, bias: bool = True):
        w32(np.asarray(p["w"]).T)        # back to (out, in)
        if bias:
            w32(p["b"])

    def ln(p: dict):
        w32(p["g"]); w32(p["b"])

    def attn(p: dict):
        lin(p["q"]); lin(p["k"], bias=False); lin(p["v"]); lin(p["o"])

    import jax
    enc, dec = params["encoder"], params["decoder"]
    w32(enc["conv1"]["w"]); w32(enc["conv1"]["b"])
    w32(enc["conv2"]["w"]); w32(enc["conv2"]["b"])
    w32(enc["pos_emb"])
    for i in range(cfg.n_audio_layers):
        lp = jax.tree.map(lambda x: np.asarray(x)[i], enc["layers"])
        attn(lp["attn"]); ln(lp["attn_ln"])
        lin(lp["fc1"]); lin(lp["fc2"]); ln(lp["mlp_ln"])
    ln(enc["ln_post"])
    w32(dec["tok_emb"]); w32(dec["pos_emb"])
    for i in range(cfg.n_text_layers):
        lp = jax.tree.map(lambda x: np.asarray(x)[i], dec["layers"])
        attn(lp["attn"]); ln(lp["attn_ln"])
        attn(lp["cross_attn"]); ln(lp["cross_ln"])
        lin(lp["fc1"]); lin(lp["fc2"]); ln(lp["mlp_ln"])
    ln(dec["ln"])
    return out.getvalue()


# ---------------------------------------------------------------------------
# safetensors (the HF distribution format — load checkpoints without torch)
# ---------------------------------------------------------------------------

def from_safetensors(path: str, cfg: WhisperConfig) -> Params:
    """Load an HF `model.safetensors` for WhisperForConditionalGeneration
    directly (no torch import). Handles both the `model.`-prefixed and bare
    key layouts."""
    from safetensors.numpy import load_file
    state = dict(load_file(path))
    if not any(k.startswith("model.") for k in state):
        state = {f"model.{k}": v for k, v in state.items()}
    return from_hf_state_dict(state, cfg)


# ---------------------------------------------------------------------------
# orbax (sharded, multi-host-capable checkpoint/resume)
# ---------------------------------------------------------------------------

def save_orbax(path: str, params: Params) -> None:
    """Checkpoint a (possibly sharded) params pytree with orbax. Unlike the
    npz path this writes per-shard without gathering to one host — the
    multi-chip checkpoint format."""
    import os
    import orbax.checkpoint as ocp
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(path), params)


def load_orbax(path: str, cfg: WhisperConfig, mesh=None) -> Params:
    """Restore an orbax checkpoint. With a mesh, arrays are restored
    directly into their tp/dp shardings (no host round-trip)."""
    import os
    import jax
    import orbax.checkpoint as ocp

    template = _param_shapes_template(cfg)
    if mesh is not None:
        from jax.sharding import NamedSharding
        from whisper_tpu.parallel.mesh import param_pspecs, sanitize_pspec
        specs = param_pspecs(template)
        template = jax.tree.map(
            lambda t, s: jax.ShapeDtypeStruct(
                t.shape, t.dtype,
                sharding=NamedSharding(mesh, sanitize_pspec(t.shape, s, mesh))),
            template, specs)
    else:
        template = jax.tree.map(
            lambda t: jax.ShapeDtypeStruct(t.shape, t.dtype), template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(os.path.abspath(path), template)


# ---------------------------------------------------------------------------
# named storage (npz)
# ---------------------------------------------------------------------------

def save_npz(path: str, params: Params) -> None:
    import jax
    flat, _ = jax.tree_util.tree_flatten_with_path(params)
    arrays = {jax.tree_util.keystr(kp): np.asarray(v) for kp, v in flat}
    np.savez(path, **arrays)


def load_npz(path: str, cfg: WhisperConfig) -> Params:
    import jax
    data = np.load(path)
    template = _param_shapes_template(cfg)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = [data[jax.tree_util.keystr(kp)] for kp, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _param_shapes_template(cfg: WhisperConfig) -> Params:
    """Zero-size template with the right tree structure for load_npz."""
    import jax
    from whisper_tpu.models.whisper import init_params
    return jax.eval_shape(lambda: init_params(cfg, jax.random.PRNGKey(0)))


def to_device(params: Params, dtype=None) -> Params:
    """numpy pytree -> device arrays, optional weight dtype cast (keeps
    LayerNorm params and embeddings fp32 for stability)."""
    import jax

    def put(x):
        a = jnp.asarray(x)
        if dtype is not None and a.dtype == jnp.float32 and a.ndim >= 2:
            a = a.astype(dtype)
        return a

    return jax.tree.map(put, params)
