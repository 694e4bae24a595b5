"""In-place KV-cache row append — the Pallas kernel that kills the decode
loop's per-step cache rewrite.

Problem (measured, v5e tiny bf16 b32, benchmarks/loop_bisect.py): every
XLA formulation of "write this step's K/V at row `pos`" — scan-stacked
per-layer dynamic_update_slice (decoder_step_t), flat-buffer DUS at a
static layer index, transposed lane-offset column writes — lowers as a
full-cache data movement, ~780 µs/step of the 1500 µs step at b32 (the
self KV cache is 88 MB; XLA rebuilds it every step instead of writing the
1/448th row). The reference hits the same problem shape and solves it the
same way: an in-place append cursor into a preallocated buffer
(layers.mojo:14-52); on TPU the only way to express "write one row, touch
nothing else" is a pallas_call with input_output_aliases.

This kernel appends ALL layers' new K/V rows in one call (grid over L,
~100 KB of DMA per step) into the standard (L, B, H, S, D) cache. The
caller's attention must therefore NOT require the current token's row to
be present in the cache — decoder_step_ip (models/whisper.py) folds the
current token's self-score in as an explicit extra softmax term instead
(identical products; see its docstring for the numerics contract).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_BLK_S = 8  # sublane-aligned row block containing `pos` (Mosaic requires
            # the block's second-minor dim to divide 8 or equal S)


def _blk_s(dtype) -> int:
    """Sublane block for the pos window: 8 for 2/4-byte dtypes, 32 for
    int8 caches (Mosaic's packed-int8 native tile is (32, 128) — an
    8-sublane window is not addressable there)."""
    return 32 if jnp.dtype(dtype).itemsize == 1 else _BLK_S


def _append_kernel(pos_ref, kn_ref, vn_ref, k_in, v_in, ko_ref, vo_ref):
    # ONE grid step owns all L layers' (L, B, H, blk, D) cache window —
    # the sublane-aligned slab containing `pos` (all layers share the write
    # position, so one DMA covers the step). Blend the new rows in at
    # sublane offset pos % blk via an iota select (Mosaic disallows
    # dynamic sublane stores on packed dtypes). The aliased cache buffers
    # outside this slab are untouched.
    p = pos_ref[0] % k_in.shape[3]
    shape = k_in.shape  # (L, B, H, blk, D)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    sel = rows == p
    ko_ref[...] = jnp.where(sel, jnp.broadcast_to(kn_ref[...], shape),
                            k_in[...])
    vo_ref[...] = jnp.where(sel, jnp.broadcast_to(vn_ref[...], shape),
                            v_in[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_append_rows(cache_k: jax.Array, cache_v: jax.Array,
                      k_new: jax.Array, v_new: jax.Array,
                      pos: jax.Array, *, interpret: bool = False
                      ) -> tuple[jax.Array, jax.Array]:
    """Write k_new/v_new (L, B, H, D) at row `pos` of the (L, B, H, S, D)
    caches, in place (operands 3/4 are aliased to the outputs — no cache
    copy; per-step DMA is L 8-row windows, ~1.5 MB at tiny b32 instead of
    the 176 MB full-cache rewrite XLA's dynamic_update_slice lowers to).
    Returns the updated (same-buffer) caches."""
    L, B, H, S, D = cache_k.shape
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    # (L,B,H,D) -> (L,B,H,1,D) outside the kernel: the in-kernel store then
    # needs no shape cast (Mosaic can't relayout sublane insertions)
    k_new = k_new.reshape(L, B, H, 1, D)
    v_new = v_new.reshape(L, B, H, 1, D)

    # one grid step when the whole (L,B,H,blk,D) slab fits in scoped VMEM
    # (compiler accounting runs ~2x the naive 2-tensor in+out estimate:
    # small b16 — L=12, H=12, 9.4 MB by the estimate — allocates 18 MB),
    # else one step per layer; vmem limit raised so the single-DMA form
    # serves every practical config
    blk = _blk_s(cache_k.dtype)
    slab_bytes = 8 * L * B * H * blk * D * cache_k.dtype.itemsize
    if slab_bytes <= 48 * 1024 * 1024:
        lb, grid = L, (1,)
    else:
        lb, grid = 1, (L,)

    row_new = pl.BlockSpec((lb, B, H, 1, D),
                           lambda g, info: (g, 0, 0, 0, 0))

    def window_at_pos(g, info):
        return (g, 0, 0, info[0] // blk, 0)

    win_cache = pl.BlockSpec((lb, B, H, blk, D), window_at_pos)

    out_k, out_v = pl.pallas_call(
        _append_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[row_new, row_new, win_cache, win_cache],
            out_specs=[win_cache, win_cache],
        ),
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype)],
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(pos_arr, k_new.astype(cache_k.dtype), v_new.astype(cache_v.dtype),
      cache_k, cache_v)
    return out_k, out_v


def _append_ragged_kernel(pos_ref, kn_ref, vn_ref, k_in, v_in,
                          ko_ref, vo_ref):
    # grid (L, B): each step owns row b of layer l — the 8-row window
    # containing pos[b]. Same iota-select blend as _append_kernel.
    b = pl.program_id(1)
    p = pos_ref[b] % k_in.shape[3]
    shape = k_in.shape  # (1, 1, H, blk, D)
    rows = jax.lax.broadcasted_iota(jnp.int32, shape, 3)
    sel = rows == p
    ko_ref[...] = jnp.where(sel, jnp.broadcast_to(kn_ref[...], shape),
                            k_in[...])
    vo_ref[...] = jnp.where(sel, jnp.broadcast_to(vn_ref[...], shape),
                            v_in[...])


@functools.partial(jax.jit, static_argnames=("interpret",))
def cache_append_rows_ragged(cache_k: jax.Array, cache_v: jax.Array,
                             k_new: jax.Array, v_new: jax.Array,
                             pos: jax.Array, *, interpret: bool = False
                             ) -> tuple[jax.Array, jax.Array]:
    """Per-row append: batch row b's new K/V land at its OWN position
    pos[b] — the continuous-batching engine's ragged write
    (decoder_step_ragged; sequences join/leave mid-decode so there is no
    shared pos). k_new/v_new: (L, B, H, D); pos: (B,) int32. In-place via
    the same aliasing as cache_append_rows; grid (L, B) of ~100 KB window
    DMAs instead of an XLA scatter's full-cache rewrite."""
    L, B, H, S, D = cache_k.shape
    pos_arr = jnp.asarray(pos, jnp.int32).reshape(B)
    k_new = k_new.reshape(L, B, H, 1, D)
    v_new = v_new.reshape(L, B, H, 1, D)

    blk = _blk_s(cache_k.dtype)
    row_new = pl.BlockSpec((1, 1, H, 1, D),
                           lambda l, b, info: (l, b, 0, 0, 0))

    def window_at_pos(l, b, info):
        return (l, b, 0, info[b] // blk, 0)

    win_cache = pl.BlockSpec((1, 1, H, blk, D), window_at_pos)

    out_k, out_v = pl.pallas_call(
        _append_ragged_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L, B),
            in_specs=[row_new, row_new, win_cache, win_cache],
            out_specs=[win_cache, win_cache],
        ),
        out_shape=[jax.ShapeDtypeStruct(cache_k.shape, cache_k.dtype),
                   jax.ShapeDtypeStruct(cache_v.shape, cache_v.dtype)],
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(pos_arr, k_new.astype(cache_k.dtype), v_new.astype(cache_v.dtype),
      cache_k, cache_v)
    return out_k, out_v
