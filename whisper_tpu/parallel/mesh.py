"""Mesh construction and sharding rules for the Whisper family.

Strategy (see SURVEY.md §2.6 for why the reference has nothing comparable):

  * **dp** (data parallel): batch dimension of mel/tokens/KV-cache. The
    batched-decode configs in BASELINE.json scale this way.
  * **tp** (tensor parallel): Megatron-style within every transformer block —
    QKV projections column-sharded (heads split across chips), out-proj
    row-sharded; fc1 column-sharded, fc2 row-sharded; vocab embedding
    row-sharded so the 51k-logit matmul is split. XLA/GSPMD inserts the
    psum/all-gathers over ICI.
  * **sp** (sequence parallel over the 1500-frame encoder) and **pp** are
    planned for Large-v3 long-form (SURVEY.md §2.6 table); the mesh helper
    accepts extra axes so those land without relayout.

All rules are expressed as PartitionSpecs over the *stacked-layer* params
pytree of models/whisper.py (leading axis = layer, never sharded).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def make_mesh(dp: int = 1, tp: int = 1, sp: int = 1, pp: int = 1,
              devices: Optional[list] = None) -> Mesh:
    """Build a (dp, sp, tp[, pp]) mesh over the given (default: all) devices.

    sp (sequence/context parallel) shards the 1500-frame encoder sequence —
    the long-form/Large-v3 axis (SURVEY.md §2.6 table); GSPMD inserts the
    K/V all-gathers encoder attention needs. pp (pipeline parallel) shards
    the stacked-layer axis, consumed by parallel/pipeline_parallel.py's
    GPipe schedule. Unused axes of size 1 collapse away."""
    devices = devices if devices is not None else jax.devices()
    if dp * sp * tp * pp != len(devices):
        raise ValueError(
            f"mesh {dp}x{sp}x{tp}x{pp} != {len(devices)} devices")
    if pp > 1:
        arr = np.asarray(devices).reshape(dp, sp, tp, pp)
        return Mesh(arr, axis_names=("dp", "sp", "tp", "pp"))
    arr = np.asarray(devices).reshape(dp, sp, tp)
    return Mesh(arr, axis_names=("dp", "sp", "tp"))


def param_pspecs(params: Params, pipeline: bool = False) -> Params:
    """PartitionSpec tree for a params pytree (tp sharding of the weights;
    dp never touches weights — they are replicated across dp). With
    pipeline=True the stacked-layer leading axis is sharded over pp, so
    each pipeline rank holds only its own stage's layers."""

    def spec_for(path: str, x) -> P:
        nd = np.ndim(x)
        layer_ax = ("pp" if pipeline and "layers" in path else None)
        # --- int8 weight-quant scale vectors ('w_s'/'tok_emb_s'): tiny;
        # replicate (checked before 'tok_emb' since the path substring
        # matches both). Sharding quantized trees is otherwise
        # unsupported — see shard_params.
        if "_s'" in path:
            return P(*([None] * nd))
        # --- embeddings ---
        if "tok_emb" in path:
            return P("tp", None)            # vocab-sharded: splits logit matmul
        if "pos_emb" in path:
            return P(None, None)
        # --- conv stem: small; replicate ---
        if "conv" in path:
            return P(*([None] * nd))
        # --- layer norms, biases of row-sharded matmuls: replicated over
        # tp (but stacked (L, d) leaves still split over pp when pipelining)
        if nd <= 2 and ("'g'" in path or ("ln" in path and "'b'" in path)):
            if nd == 2 and layer_ax:
                return P(layer_ax, None)
            return P(*([None] * nd))
        # --- stacked linear weights: (L, in, out) ---
        if nd == 3:
            if "fc2" in path or "'o'" in path:
                return P(layer_ax, "tp", None)  # row-parallel (reduce->psum)
            return P(layer_ax, None, "tp")      # column-parallel (q/k/v, fc1)
        # --- stacked biases: (L, out) ---
        if nd == 2:
            if "fc2" in path or "'o'" in path:
                return P(layer_ax, None)     # bias of row-parallel: replicated
            return P(layer_ax, "tp")
        # --- unstacked encoder-final / decoder-final LN params (d,) ---
        return P(*([None] * nd))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    specs = [spec_for(jax.tree_util.keystr(kp), x) for kp, x in flat]
    return jax.tree_util.tree_unflatten(treedef, specs)


def sanitize_pspec(shape, spec: P, mesh: Mesh) -> P:
    """Drop sharded axes whose dimension isn't divisible by the mesh axis
    size — the correctness fallback for any leaf whose shape resists the
    rule table. The one leaf where this used to bite for real models — the
    vocab embedding (51,865 = 5*11*23*41, indivisible by any practical
    tp) — is now PADDED to a divisible row count by shard_params before
    placement, so the logit matmul genuinely splits; this fallback remains
    for exotic shapes."""
    fixed = []
    for dim, ax in zip(shape, tuple(spec) + (None,) * (len(shape) - len(spec))):
        if ax is None:
            fixed.append(None)
            continue
        axes = ax if isinstance(ax, tuple) else (ax,)
        size = int(np.prod([mesh.shape[a] for a in axes]))
        fixed.append(ax if dim % size == 0 else None)
    return P(*fixed)


# Per-shard vocab rows are rounded up to a lane-width multiple so each tp
# shard's logit matmul output lands on clean 128-lane tiles.
_VOCAB_LANE = 128


def padded_vocab_rows(vocab: int, tp: int) -> int:
    """Smallest row count >= vocab that splits into tp equal lane-aligned
    shards (e.g. 51,865 @ tp=4 -> 52,224 = 4 x 102 x 128)."""
    per = -(-vocab // (tp * _VOCAB_LANE)) * _VOCAB_LANE
    return per * tp


def shard_params(params: Params, mesh: Mesh,
                 pipeline: Optional[bool] = None) -> Params:
    """Place a params pytree onto the mesh per param_pspecs (axes that don't
    divide are replicated, see sanitize_pspec). pipeline defaults to True
    exactly when the mesh has a pp axis of size > 1.

    Vocab padding: under tp > 1 the token embedding's row count rarely
    divides tp (51,865 = 5*11*23*41), which would silently replicate the
    single largest decode matmul (the 51k-logit projection). shard_params
    therefore zero-pads tok_emb rows to padded_vocab_rows() before
    placement, making P("tp", None) real. The pad rows are mathematically
    inert: the tied-logit matmul gives them exact-zero logits (h @ 0, no
    bias) and final_logits slices the output back to cfg.vocab_size, so
    no downstream consumer ever sees them; embedding lookups never index
    past the true vocab. Note the SHARDED tree's tok_emb is therefore
    wider than the checkpoint's — export from the original tree."""
    if pipeline is None:
        pipeline = "pp" in mesh.axis_names and mesh.shape["pp"] > 1
    specs = param_pspecs(params, pipeline=pipeline)
    tp = int(mesh.shape["tp"]) if "tp" in mesh.axis_names else 1
    if tp > 1 and "tok_emb_s" in params.get("decoder", {}):
        # the vocab-pad machinery below would pad the int8 table but not
        # its per-row scales; quantize AFTER sharding (or run weight_quant
        # single-chip) rather than silently mis-sharding
        raise NotImplementedError(
            "weight_quant trees cannot be tensor-parallel sharded; shard "
            "the unquantized tree (weight_quant is a single-chip serving "
            "feature, DESIGN.md §28)")

    def place(path: str, x, s: P):
        shape = np.shape(x)
        if (tp > 1 and "tok_emb" in path and len(shape) == 2
                and shape[0] % tp != 0):
            rows = padded_vocab_rows(shape[0], tp)
            x = jnp.pad(jnp.asarray(x), ((0, rows - shape[0]), (0, 0)))
            shape = (rows, shape[1])
        return jax.device_put(
            x, NamedSharding(mesh, sanitize_pspec(shape, s, mesh)))

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    sflat = jax.tree_util.tree_leaves(specs)
    placed = [place(jax.tree_util.keystr(kp), x, s)
              for (kp, x), s in zip(flat, sflat)]
    return jax.tree_util.tree_unflatten(treedef, placed)


def activation_shardings(mesh: Mesh) -> dict[str, NamedSharding]:
    """Canonical activation/IO shardings: batch over dp; the mel time axis
    (and hence the encoder sequence) over sp when present."""
    sp = "sp" if "sp" in mesh.axis_names else None
    return {
        "mel": NamedSharding(mesh, P("dp", None, sp)),        # (B, n_mels, T)
        "enc_out": NamedSharding(mesh, P("dp", sp, None)),    # (B, S, d)
        "tokens": NamedSharding(mesh, P("dp", None)),         # (B, T)
        "audio": NamedSharding(mesh, P("dp", sp)),            # (B, samples)
        "replicated": NamedSharding(mesh, P()),
    }
