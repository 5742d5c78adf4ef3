"""In-place per-slot KV cache row updates (Pallas, input/output aliased).

Why this exists: the decode step writes one new KV row per slot at a
per-slot position. As a jnp scatter (``cache.at[rows, pos].set(kv)``) XLA
lowers the per-slot-index update to a kLoop fusion that REWRITES THE ENTIRE
cache buffer, and copy-insertion then double-buffers the scan carry —
measured 3.85 GB of writes per decode step on a 0.8B/16-slot serving config
(see PERF.md). This kernel maps each grid step's output block directly to
``cache[b, idx[b]+j]`` and aliases the cache input to the output, so Mosaic
writes ONLY the touched rows; everything else stays in place.

Used by models/attention.py KVCache for both the 1-token autoregressive
write and the K-token speculative verify span (MODE_VERIFY).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, kv_ref, _cache_ref, o_ref):
    # output block is mapped to the target row; the aliased cache input is
    # never read — untouched blocks are preserved by aliasing.
    o_ref[...] = kv_ref[...]


def inplace_row_update(
    cache: jax.Array,  # [B, S, ...inner] — updated IN PLACE (donated)
    kv: jax.Array,  # [B, K, ...inner] rows to write
    idx: jax.Array,  # [B] int32: row b's span starts at idx[b]
    interpret: bool = False,
) -> jax.Array:
    """Returns cache with ``cache[b, idx[b]+j] = kv[b, j]`` (j < K), writing
    only the touched rows. Positions are clamped to S-1 (callers keep
    idx+K <= S; the clamp only guards compiler-visible OOB)."""
    if cache.ndim == 3:
        # Mosaic requires the block's last two dims to be (8,128)-divisible
        # or equal to the array dims; a 3-D cache blocks the span axis to 1,
        # violating that. A unit axis makes the trailing dims full — the
        # expand/squeeze is a bitcast, so aliasing is preserved.
        out = inplace_row_update(
            cache[:, :, None, :], kv[:, :, None, :], idx, interpret=interpret
        )
        return out[:, :, 0, :]
    b_sz, s_len = cache.shape[:2]
    k_span = kv.shape[1]
    inner = cache.shape[2:]
    blk = (1, 1) + inner

    grid = (b_sz, k_span)

    def kv_map(b, j, idx_ref):
        del idx_ref
        return (b, j) + (0,) * len(inner)

    def out_map(b, j, idx_ref):
        return (b, jnp.minimum(idx_ref[b] + j, s_len - 1)) + (0,) * len(inner)

    return pl.pallas_call(
        _kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(blk, kv_map),
                pl.BlockSpec(blk, out_map),  # aliased; never read
            ],
            out_specs=pl.BlockSpec(blk, out_map),
        ),
        out_shape=jax.ShapeDtypeStruct(cache.shape, cache.dtype),
        # inputs flatten as (idx scalar-prefetch, kv, cache) -> alias cache
        input_output_aliases={2: 0},
        interpret=interpret,
        name="kv_inplace_row_update",
    )(idx.astype(jnp.int32), kv.astype(cache.dtype), cache)
