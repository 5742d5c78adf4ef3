"""Paged KV cache + paged decode attention.

Reference: MaxText/inference/paged_attention.py (PagedAttentionOp:99) +
paged_attention_kernel_v2.py. The cache is [num_pages, tokens_per_page,
n_kv, d]; sequences own scattered page lists (infer/page_manager.py).

Decode attention gathers a slot's pages into a contiguous [max_len] view and
runs masked dot-product attention — correct everywhere and efficient for the
moderate contexts TTS serving uses; the jax ragged-paged-attention TPU kernel
can be swapped in behind the same interface for long-context serving.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.infer.page_manager import PageState


class PagedKVCache(NamedTuple):
    key_pages: jax.Array  # [num_pages, tokens_per_page, n_kv, d]
    value_pages: jax.Array

    @property
    def tokens_per_page(self) -> int:
        return self.key_pages.shape[1]


def init_paged_cache(
    num_pages: int, tokens_per_page: int, n_kv: int, d: int, dtype=jnp.bfloat16
) -> PagedKVCache:
    shape = (num_pages, tokens_per_page, n_kv, d)
    return PagedKVCache(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def write_prefill(
    cache: PagedKVCache, page_ids: jax.Array, k: jax.Array, v: jax.Array
) -> PagedKVCache:
    """k,v: [1, P, n_kv, d] prefill keys/values -> scatter into pages.
    P must be a multiple of tokens_per_page (pad prompts to the bucket)."""
    tpp = cache.tokens_per_page
    p = k.shape[1]
    n_pages = p // tpp
    k_pages = k[0].reshape(n_pages, tpp, *k.shape[2:])
    v_pages = v[0].reshape(n_pages, tpp, *v.shape[2:])
    ids = page_ids[:n_pages]
    return PagedKVCache(
        key_pages=cache.key_pages.at[ids].set(k_pages.astype(cache.key_pages.dtype)),
        value_pages=cache.value_pages.at[ids].set(v_pages.astype(cache.value_pages.dtype)),
    )


def write_decode_step(
    cache: PagedKVCache, state: PageState, k: jax.Array, v: jax.Array
) -> PagedKVCache:
    """k,v: [num_slots, 1, n_kv, d] — write each slot's token at its current
    position (seq_lens already advanced by allocate_decode_step, so position
    is seq_lens-1)."""
    tpp = cache.tokens_per_page
    pos = jnp.maximum(state.seq_lens - 1, 0)
    page_idx = pos // tpp
    offset = pos % tpp
    slots = jnp.arange(k.shape[0])
    pages = state.page_map[slots, page_idx]
    active = state.seq_lens > 0
    kp = cache.key_pages.at[pages, offset].set(
        jnp.where(active[:, None, None], k[:, 0].astype(cache.key_pages.dtype),
                  cache.key_pages[pages, offset])
    )
    vp = cache.value_pages.at[pages, offset].set(
        jnp.where(active[:, None, None], v[:, 0].astype(cache.value_pages.dtype),
                  cache.value_pages[pages, offset])
    )
    return PagedKVCache(kp, vp)


def paged_decode_attention(
    q: jax.Array,  # [num_slots, 1, n_q, d]
    cache: PagedKVCache,
    state: PageState,
    logits_soft_cap: float = 0.0,
) -> jax.Array:
    """Gather each slot's pages to a contiguous view and attend."""
    from maxtext_indextts2_tpu.models.attention import dot_product_attention

    tpp = cache.tokens_per_page
    num_slots, max_pages = state.page_map.shape
    # [slots, max_pages, tpp, n_kv, d] -> [slots, max_len, n_kv, d]
    k = cache.key_pages[state.page_map].reshape(num_slots, max_pages * tpp, *cache.key_pages.shape[2:])
    v = cache.value_pages[state.page_map].reshape(num_slots, max_pages * tpp, *cache.value_pages.shape[2:])
    valid = jnp.arange(max_pages * tpp)[None, :] < state.seq_lens[:, None]
    mask = valid[:, None, None, :]
    return dot_product_attention(q, k, v, mask, logits_soft_cap)
