"""Expert parallelism (ep): a mixture-of-experts MLP sharded over an
expert mesh axis.

Whisper proper has no MoE layers anywhere in the family (SURVEY.md §2.6
documents ep as N/A to the reference), so this module is the axis DESIGN —
a working, tested demonstration that the framework's mesh vocabulary
extends to expert sharding, usable by MoE-adapted decoders:

  * Top-1 (switch) routing in the GShard einsum formulation — dispatch and
    combine are one-hot einsums, fully static shapes, no sorting/gather, so
    XLA partitions them cleanly.
  * Expert weights carry a leading E axis sharded P("ep", ...); GSPMD turns
    the dispatch einsum into an all-to-all-free broadcast-select (every
    expert shard computes its slice of tokens) and the combine einsum into
    a psum over ep — collectives ride ICI, the same pattern as tp.
  * Capacity-less: every expert sees every token position (zeroed for
    non-routed tokens). Exact — no dropped tokens — and the right tradeoff
    at demo scale; a production MoE would add capacity-factor dispatch.

Dense equivalence: with identical expert weights the layer equals the
plain MLP for any routing, which is the correctness anchor the tests pin
(plus sharded-vs-unsharded exactness on the virtual mesh).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_moe_params(key, d_model: int, d_ff: int, n_experts: int,
                    dtype=jnp.float32) -> dict:
    """Router + per-expert MLP weights (leading E axis)."""
    kg, k1, k2 = jax.random.split(key, 3)
    s1 = (2.0 / d_model) ** 0.5
    return {
        "router": {"w": (jax.random.normal(kg, (d_model, n_experts)) * 0.02
                         ).astype(dtype)},
        "w1": (jax.random.normal(k1, (n_experts, d_model, d_ff)) * s1
               ).astype(dtype),
        "b1": jnp.zeros((n_experts, d_ff), dtype),
        "w2": (jax.random.normal(k2, (n_experts, d_ff, d_model)) * s1
               ).astype(dtype),
        "b2": jnp.zeros((n_experts, d_model), dtype),
    }


def moe_specs() -> dict:
    """PartitionSpecs for shard_params-style tree mapping: experts over ep."""
    return {
        "router": {"w": P(None, None)},
        "w1": P("ep", None, None),
        "b1": P("ep", None),
        "w2": P("ep", None, None),
        "b2": P("ep", None),
    }


def shard_moe_params(params: dict, mesh: Mesh) -> dict:
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
        params, moe_specs())


def moe_mlp(x: jax.Array, params: dict) -> jax.Array:
    """Top-1 switch MLP: (B, T, d) -> (B, T, d).

    GShard einsum formulation — everything is dense algebra over the E
    axis, so the SAME code runs unsharded or with params sharded over ep
    (GSPMD inserts the combine psum)."""
    gates = jax.nn.softmax(
        jnp.einsum("btd,de->bte", x.astype(jnp.float32),
                   params["router"]["w"].astype(jnp.float32)), axis=-1)
    top = jnp.argmax(gates, axis=-1)                        # (B, T)
    onehot = jax.nn.one_hot(top, gates.shape[-1],
                            dtype=x.dtype)                  # (B, T, E)
    gate_val = jnp.take_along_axis(gates, top[..., None],
                                   axis=-1).astype(x.dtype)  # (B, T, 1)

    # dispatch: every expert gets its tokens (others zeroed)
    xe = jnp.einsum("btd,bte->ebtd", x, onehot)             # (E, B, T, d)
    h = jax.nn.gelu(
        jnp.einsum("ebtd,edf->ebtf", xe, params["w1"])
        + params["b1"][:, None, None, :], approximate=False)
    ye = jnp.einsum("ebtf,efd->ebtd", h, params["w2"]) \
        + params["b2"][:, None, None, :]
    # combine: select each token's expert output, scale by its gate
    y = jnp.einsum("ebtd,bte->btd", ye, onehot)
    return y * gate_val


_moe_mlp_jit = None


def moe_mlp_sharded(x: jax.Array, params: dict, mesh: Mesh,
                    batch_axis: Optional[str] = "dp") -> jax.Array:
    """Convenience wrapper: jit moe_mlp with x batch-sharded and params
    expert-sharded on the given mesh. The jitted callable is module-level
    so its trace/compile cache is shared across calls."""
    global _moe_mlp_jit
    if _moe_mlp_jit is None:
        _moe_mlp_jit = jax.jit(moe_mlp)
    xs = NamedSharding(mesh, P(batch_axis, None, None)
                       if batch_axis else P(None, None, None))
    x = jax.device_put(x, xs)
    return _moe_mlp_jit(x, params)
