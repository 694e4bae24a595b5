"""Pipeline parallelism: GPipe microbatch schedule over a `pp` mesh axis.

The reference has no multi-device story at all (SURVEY.md §2.6); dp/tp/sp
landed in parallel/mesh.py round 1. This module adds the fourth axis the
survey calls for: **pipeline parallelism over the stacked-layer dimension**,
the axis that lets large-v3 run on chips whose HBM can't hold all layers.

TPU-native design (not a port of anything in the reference):
  * The transformer stack is already a `lax.scan` over a stacked (L, ...)
    params pytree (models/whisper.py). Pipelining shards that leading layer
    axis over the `pp` mesh axis — each rank owns L/pp contiguous layers —
    and streams microbatches through the stages with `jax.lax.ppermute`
    (activation hand-off rides ICI, one hop per schedule tick).
  * Implemented with `jax.shard_map(..., axis_names={"pp"})` — *partial
    manual* mode: only `pp` is manual; dp/sp/tp shardings on the same arrays
    stay under GSPMD control inside the stage body, so pipeline composes
    with data/tensor/sequence parallelism on one 4-axis mesh (validated
    bit-exact in tests/test_pipeline_parallel.py and __graft_entry__).
  * The schedule is plain GPipe: M microbatches, M + pp - 1 ticks, bubble
    fraction (pp-1)/(M+pp-1). Every tick runs each rank's stage (a local
    `lax.scan` over its L/pp layers) and one cyclic ppermute. The carried
    state is a pytree, so stages can thread pass-through operands (the
    decoder carries its microbatch's encoder output for cross-attention).
  * Differentiable end-to-end: `ppermute`/`psum` have exact transposes, so
    `jax.grad` of the pipelined loss is the reverse-schedule backward pass —
    train_step_pp below is the full training step on a (dp, sp, tp, pp)
    mesh.

Microbatch inputs are replicated over pp (each rank selects what it needs by
`axis_index`); activation memory per rank matches the unsharded model, while
*weights* scale 1/pp per rank — the axis exists to fit layers, not
activations.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from whisper_tpu.config import WhisperConfig
from whisper_tpu.models.whisper import (
    gelu,
    layer_norm,
    linear,
    merge_heads,
    qkv_fused,
    split_heads,
    split_heads_hm,
)
from whisper_tpu.ops.attention import multi_head_attention
from whisper_tpu.train import TrainBatch

Params = Any
HIGHEST = jax.lax.Precision.HIGHEST


def pipelined_scan(block_fn, state, stacked, mesh: Mesh,
                   microbatches: Optional[int] = None,
                   pp_axis: str = "pp"):
    """scan(block_fn, state, stacked) with the layer axis pipelined over
    `pp_axis` (GPipe schedule). Bit-identical to the plain scan.

    Args:
      block_fn: (state_pytree, layer_slice_pytree) -> state_pytree. Leaves
        of `state` are arrays with a leading microbatchable axis (batch).
      state: the scan carry — every leaf (B, ...).
      stacked: pytree with leading layer axis L on every leaf; L % pp == 0.
      mesh: mesh containing `pp_axis` (other axes stay automatic/GSPMD).
      microbatches: M (default pp); B % M == 0. Larger M shrinks the
        pipeline bubble: (pp-1)/(M+pp-1) of ticks are idle per rank.
    Returns:
      final state pytree, shaped like `state`.
    """
    pp = mesh.shape[pp_axis]
    L = jax.tree.leaves(stacked)[0].shape[0]
    if pp == 1:
        out, _ = jax.lax.scan(lambda c, lp: (block_fn(c, lp), None),
                              state, stacked)
        return out
    if L % pp:
        raise ValueError(f"{L} layers not divisible by pp={pp}")
    B = jax.tree.leaves(state)[0].shape[0]
    M = microbatches or pp
    if B % M:
        raise ValueError(f"batch {B} not divisible by microbatches={M}")
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def to_mb(x):
        return x.reshape((M, B // M) + x.shape[1:])

    def rank_body(state_mb, local_stack):
        rank = jax.lax.axis_index(pp_axis)

        def stage(x):
            y, _ = jax.lax.scan(lambda c, lp: (block_fn(c, lp), None),
                                x, local_stack)
            return y

        def take(tree, i):
            return jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, i, 0,
                                                       keepdims=False), tree)

        def tick(carry, t):
            st, out = carry
            # rank 0 feeds microbatch t; downstream ranks consume what the
            # previous rank handed over on the last tick
            x = jax.tree.map(lambda inp, s: jnp.where(rank == 0, inp, s),
                             take(state_mb, jnp.clip(t, 0, M - 1)), st)
            y = stage(x)
            # the last rank's output at tick t is microbatch t - (pp-1)
            out_t = t - (pp - 1)
            i = jnp.clip(out_t, 0, M - 1)
            write = jnp.logical_and(rank == pp - 1, out_t >= 0)
            out = jax.tree.map(
                lambda o, n: jax.lax.dynamic_update_index_in_dim(
                    o, jnp.where(write, n,
                                 jax.lax.dynamic_index_in_dim(
                                     o, i, 0, keepdims=False)), i, 0),
                out, y)
            nxt = jax.tree.map(lambda a: jax.lax.ppermute(a, pp_axis, perm), y)
            return (nxt, out), None

        zeros_st = jax.tree.map(lambda a: jnp.zeros_like(a[0]), state_mb)
        zeros_out = jax.tree.map(jnp.zeros_like, state_mb)
        (_, out), _ = jax.lax.scan(tick, (zeros_st, zeros_out),
                                   jnp.arange(M + pp - 1))
        # results live on the last rank; zero-masked psum broadcasts them
        # (adding exact zeros — bit-exact)
        return jax.tree.map(
            lambda a: jax.lax.psum(
                jnp.where(rank == pp - 1, a, jnp.zeros_like(a)), pp_axis),
            out)

    fn = jax.shard_map(rank_body, mesh=mesh, in_specs=(P(), P(pp_axis)),
                       out_specs=P(), axis_names={pp_axis}, check_vma=False)
    # partial-manual shard_map (axis_names ⊂ mesh axes) only traces under
    # jit; jit here so eager callers work too (inlined when already jitted)
    out_mb = jax.jit(fn)(jax.tree.map(to_mb, state), stacked)
    return jax.tree.map(lambda x: x.reshape((B,) + x.shape[2:]), out_mb)


# ---------------------------------------------------------------------------
# pipelined model forwards (training / prefill shapes, full sequences)
# ---------------------------------------------------------------------------

def encoder_forward_pp(params: Params, cfg: WhisperConfig, mel: jax.Array,
                       mesh: Mesh,
                       microbatches: Optional[int] = None) -> jax.Array:
    """encoder_forward with the block stack pipelined over `pp`. The conv
    stem and final LN replicate models/whisper.py:193-219 exactly; the block
    body is the same math, so the output is bit-identical to the unsharded
    forward (asserted in tests)."""
    enc = params["encoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    x = mel.astype(dtype)

    def conv(x, p, stride):
        return jax.lax.conv_general_dilated(
            x, p["w"].astype(dtype), window_strides=(stride,),
            padding=[(1, 1)], dimension_numbers=("NCH", "OIH", "NCH"),
            precision=HIGHEST,
        ) + p["b"].astype(dtype)[None, :, None]

    x = gelu(conv(x, enc["conv1"], 1))
    x = gelu(conv(x, enc["conv2"], 2))
    x = jnp.transpose(x, (0, 2, 1)) + enc["pos_emb"].astype(dtype)

    def block(h, lp):
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        q, k, v = qkv_fused(y, lp["attn"], cfg.n_heads)
        a = merge_heads(multi_head_attention(q, k, v,
                                             backend=cfg.attn_backend))
        h = r + linear(a, lp["attn"]["o"])
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        return r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])

    x = pipelined_scan(block, x, enc["layers"], mesh,
                       microbatches=microbatches)
    return layer_norm(x, enc["ln_post"]["g"], enc["ln_post"]["b"], cfg.ln_eps)


def decoder_logits_pp(params: Params, cfg: WhisperConfig, tokens: jax.Array,
                      enc_out: jax.Array, mesh: Mesh,
                      microbatches: Optional[int] = None) -> jax.Array:
    """Teacher-forced full-sequence decoder logits, block stack pipelined
    over `pp`. Same math as decoder_forward from an empty cache with
    kv_len=T (models/whisper.py:351-395), with cross K/V projected inside
    each stage (each rank owns its layers' cross weights, so the encoder
    output — not L per-layer K/V tensors — travels through the pipeline)."""
    dec = params["decoder"]
    dtype = jnp.dtype(cfg.compute_dtype)
    B, T = tokens.shape
    h = dec["tok_emb"][tokens].astype(dtype) + \
        dec["pos_emb"][:T].astype(dtype)

    def block(state, lp):
        h, enc = state["h"], state["enc"]
        r = h
        y = layer_norm(h, lp["attn_ln"]["g"], lp["attn_ln"]["b"], cfg.ln_eps)
        q, k, v = qkv_fused(y, lp["attn"], cfg.n_heads)
        a = merge_heads(multi_head_attention(q, k, v, causal=True,
                                             backend=cfg.attn_backend))
        h = r + linear(a, lp["attn"]["o"])
        r = h
        y = layer_norm(h, lp["cross_ln"]["g"], lp["cross_ln"]["b"],
                       cfg.ln_eps)
        q = split_heads(linear(y, lp["cross_attn"]["q"]), cfg.n_heads)
        xk = split_heads_hm(linear(enc, lp["cross_attn"]["k"]), cfg.n_heads)
        xv = split_heads_hm(linear(enc, lp["cross_attn"]["v"]), cfg.n_heads)
        a = merge_heads(multi_head_attention(q, xk, xv,
                                             backend=cfg.attn_backend))
        h = r + linear(a, lp["cross_attn"]["o"])
        r = h
        y = layer_norm(h, lp["mlp_ln"]["g"], lp["mlp_ln"]["b"], cfg.ln_eps)
        h = r + linear(gelu(linear(y, lp["fc1"])), lp["fc2"])
        return {"h": h, "enc": enc}

    state = pipelined_scan(block, {"h": h, "enc": enc_out.astype(dtype)},
                           dec["layers"], mesh, microbatches=microbatches)
    h = layer_norm(state["h"], dec["ln"]["g"], dec["ln"]["b"], cfg.ln_eps)
    if dtype == jnp.float32:
        logits = jnp.dot(h.astype(jnp.float32),
                         dec["tok_emb"].T.astype(jnp.float32),
                         precision=HIGHEST)
    else:
        logits = jnp.dot(h, dec["tok_emb"].T.astype(dtype),
                         preferred_element_type=jnp.float32)
    # tp-padded vocab rows (mesh.py shard_params) -> slice the exact-zero
    # pad logits back off, as in models.whisper.final_logits
    if logits.shape[-1] != cfg.vocab_size:
        logits = jax.lax.slice_in_dim(logits, 0, cfg.vocab_size, axis=-1)
    return logits


# ---------------------------------------------------------------------------
# pipelined training step (4-axis mesh: dp x sp x tp x pp)
# ---------------------------------------------------------------------------

def loss_fn_pp(params: Params, cfg: WhisperConfig, batch: TrainBatch,
               mesh: Mesh, microbatches: Optional[int] = None) -> jax.Array:
    """train.loss_fn with both block stacks pipelined (same masked-CE)."""
    enc_out = encoder_forward_pp(params, cfg, batch.mel, mesh,
                                 microbatches=microbatches)
    logits = decoder_logits_pp(params, cfg, batch.tokens, enc_out, mesh,
                               microbatches=microbatches)
    logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
    tgt = batch.tokens[:, 1:]
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    mask = batch.loss_mask[:, :-1]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def train_step_pp(params: Params, opt_state, cfg: WhisperConfig,
                  batch: TrainBatch,
                  optimizer: optax.GradientTransformation, mesh: Mesh,
                  microbatches: Optional[int] = None):
    """One SGD step with pipelined forward AND backward (jax transposes the
    GPipe schedule through ppermute/psum). Pure; jit with static
    (cfg, optimizer, mesh, microbatches)."""
    loss, grads = jax.value_and_grad(loss_fn_pp)(params, cfg, batch, mesh,
                                                 microbatches)
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, {"loss": loss,
                               "grad_norm": optax.global_norm(grads)}
