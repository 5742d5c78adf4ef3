"""Jit-compatible paged KV-cache page manager.

Reference: MaxText/inference/page_manager.py (PageState:49, PageManager:415).
Pure-functional page allocation over fixed-size arrays — no python state, so
every op jits and can live inside the serving step:

- ``page_status``: [num_pages] 0/1 used flag (page 0 is reserved as the null
  page so int32 zeros initialize to "pointing at null").
- ``page_map``: [num_slots, max_pages_per_slot] page ids per sequence.
- ``seq_lens``: [num_slots] current token counts.

Allocation picks free pages with a cumsum-based rank over the status bitmap
(deterministic, O(num_pages), no sort).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PageState(NamedTuple):
    page_status: jax.Array  # [num_pages] int32, 1 = in use (page 0 reserved)
    page_map: jax.Array  # [num_slots, max_pages_per_slot] int32
    seq_lens: jax.Array  # [num_slots] int32

    @property
    def num_pages(self) -> int:
        return self.page_status.shape[0]


def init_page_state(num_pages: int, num_slots: int, max_pages_per_slot: int) -> PageState:
    status = jnp.zeros(num_pages, jnp.int32).at[0].set(1)  # reserve null page
    return PageState(
        page_status=status,
        page_map=jnp.zeros((num_slots, max_pages_per_slot), jnp.int32),
        seq_lens=jnp.zeros(num_slots, jnp.int32),
    )


def _take_free_pages(status: jax.Array, k_max: int, need: jax.Array):
    """Pick the first ``need`` free pages (need <= k_max static bound).
    Returns (new_status, page_ids [k_max] — null page 0 beyond ``need``)."""
    free_rank = jnp.cumsum(1 - status) * (1 - status)  # 1-based rank among free
    # page id of the r-th free page: scatter ranks -> ids
    ids_by_rank = jnp.zeros(k_max + 1, jnp.int32)
    valid = (free_rank >= 1) & (free_rank <= k_max)
    ids_by_rank = ids_by_rank.at[jnp.where(valid, free_rank, 0)].set(
        jnp.where(valid, jnp.arange(status.shape[0], dtype=jnp.int32), 0)
    )
    ranks = jnp.arange(1, k_max + 1)
    page_ids = jnp.where(ranks <= need, ids_by_rank[ranks], 0)
    new_status = status.at[page_ids].set(jnp.where(ranks <= need, 1, status[page_ids]))
    return new_status, page_ids


def release_slot(state: PageState, slot: int | jax.Array) -> PageState:
    pages = state.page_map[slot]
    status = state.page_status.at[pages].set(
        jnp.where(pages > 0, 0, state.page_status[pages])
    )
    return PageState(
        page_status=status.at[0].set(1),
        page_map=state.page_map.at[slot].set(0),
        seq_lens=state.seq_lens.at[slot].set(0),
    )


def allocate_prefill(
    state: PageState, slot: int | jax.Array, true_length: jax.Array,
    tokens_per_page: int, max_pages_per_slot: int,
) -> tuple[PageState, jax.Array]:
    """Reserve pages for a prefilled sequence. Returns (state, page_ids)."""
    state = release_slot(state, slot)
    need = (true_length + tokens_per_page - 1) // tokens_per_page
    status, page_ids = _take_free_pages(state.page_status, max_pages_per_slot, need)
    return (
        PageState(
            page_status=status,
            page_map=state.page_map.at[slot].set(page_ids),
            seq_lens=state.seq_lens.at[slot].set(true_length),
        ),
        page_ids,
    )


def allocate_decode_step(
    state: PageState, tokens_per_page: int, active=None
) -> PageState:
    """Advance each live slot by one token, growing pages at boundaries.

    ``active`` ([num_slots] bool) restricts advancement to live requests —
    without it a finished-but-not-released slot keeps consuming a page every
    tokens_per_page steps for as long as anything else decodes."""
    live = state.seq_lens > 0
    if active is not None:
        live = live & active
    new_lens = jnp.where(live, state.seq_lens + 1, state.seq_lens)
    needs_page = live & (state.seq_lens % tokens_per_page == 0)

    def grow(i, carry):
        status, page_map = carry
        def do(args):
            status, page_map = args
            status2, ids = _take_free_pages(status, 1, jnp.asarray(1, jnp.int32))
            page_idx = state.seq_lens[i] // tokens_per_page
            return status2, page_map.at[i, page_idx].set(ids[0])
        return jax.lax.cond(needs_page[i], do, lambda a: a, (status, page_map))

    status, page_map = jax.lax.fori_loop(
        0, state.seq_lens.shape[0], grow, (state.page_status, state.page_map)
    )
    return PageState(page_status=status, page_map=page_map, seq_lens=new_lens)


def num_free_pages(state: PageState) -> jax.Array:
    return jnp.sum(1 - state.page_status)
