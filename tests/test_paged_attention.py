"""Page manager + paged attention tests (reference:
tests/inference/page_manager_test.py, paged_attention tests)."""

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.infer.page_manager import (
    allocate_decode_step,
    allocate_prefill,
    init_page_state,
    num_free_pages,
    release_slot,
)
from maxtext_indextts2_tpu.infer.paged_attention import (
    init_paged_cache,
    paged_decode_attention,
    write_decode_step,
    write_prefill,
)
from maxtext_indextts2_tpu.models.attention import dot_product_attention

TPP = 4  # tokens per page


def test_page_allocation_lifecycle():
    state = init_page_state(num_pages=16, num_slots=2, max_pages_per_slot=4)
    assert int(num_free_pages(state)) == 15  # page 0 reserved

    state, pages = jax.jit(
        lambda s: allocate_prefill(s, 0, jnp.asarray(6), TPP, 4)
    )(state)
    assert int(state.seq_lens[0]) == 6
    used = np.asarray(pages)
    assert (used[:2] > 0).all() and (used[2:] == 0).all()  # ceil(6/4)=2 pages
    assert int(num_free_pages(state)) == 13

    # decode steps: tokens 7, 8 fit page 2; token 9 allocates page 3
    for expect_pages in (2, 2, 3):
        state = jax.jit(lambda s: allocate_decode_step(s, TPP))(state)
        n_pages = int((np.asarray(state.page_map[0]) > 0).sum())
        assert n_pages == expect_pages

    state = release_slot(state, 0)
    assert int(num_free_pages(state)) == 15
    assert int(state.seq_lens[0]) == 0


def test_inactive_slot_stops_consuming_pages():
    """A finished slot (active=False) must not keep growing pages while
    other slots decode — the leak corrupted long-running paged serving."""
    state = init_page_state(num_pages=16, num_slots=2, max_pages_per_slot=4)
    state, _ = allocate_prefill(state, 0, jnp.asarray(4), TPP, 4)
    state, _ = allocate_prefill(state, 1, jnp.asarray(4), TPP, 4)
    active = jnp.asarray([False, True])
    free_before = int(num_free_pages(state))
    for _ in range(2 * TPP):
        state = jax.jit(lambda s: allocate_decode_step(s, TPP, active))(state)
    # slot 0 frozen: len unchanged, no new pages; slot 1 grew 2 pages
    assert int(state.seq_lens[0]) == 4
    assert int(state.seq_lens[1]) == 4 + 2 * TPP
    assert int((np.asarray(state.page_map[0]) > 0).sum()) == 1
    assert free_before - int(num_free_pages(state)) == 2


def test_two_slots_no_page_collision():
    state = init_page_state(num_pages=32, num_slots=2, max_pages_per_slot=4)
    state, p0 = allocate_prefill(state, 0, jnp.asarray(8), TPP, 4)
    state, p1 = allocate_prefill(state, 1, jnp.asarray(8), TPP, 4)
    s0 = set(np.asarray(p0)[np.asarray(p0) > 0].tolist())
    s1 = set(np.asarray(p1)[np.asarray(p1) > 0].tolist())
    assert not (s0 & s1)


def test_paged_attention_matches_contiguous():
    """Prefill + decode writes through pages must reproduce plain attention."""
    n_kv, n_q, d = 2, 4, 16
    slots, max_pages = 2, 4
    state = init_page_state(num_pages=32, num_slots=slots, max_pages_per_slot=max_pages)
    cache = init_paged_cache(32, TPP, n_kv, d, jnp.float32)

    key = jax.random.PRNGKey(0)
    P = 8  # prefill length (multiple of TPP)
    k_pre = jax.random.normal(key, (1, P, n_kv, d))
    v_pre = jax.random.normal(jax.random.PRNGKey(1), (1, P, n_kv, d))

    state, pages = allocate_prefill(state, 0, jnp.asarray(P), TPP, max_pages)
    cache = write_prefill(cache, pages, k_pre, v_pre)

    # two decode steps
    ks, vs = [k_pre], [v_pre]
    for i in range(2):
        state = allocate_decode_step(state, TPP)
        k_new = jax.random.normal(jax.random.PRNGKey(10 + i), (slots, 1, n_kv, d))
        v_new = jax.random.normal(jax.random.PRNGKey(20 + i), (slots, 1, n_kv, d))
        cache = write_decode_step(cache, state, k_new, v_new)
        ks.append(k_new[:1])
        vs.append(v_new[:1])

    q = jax.random.normal(jax.random.PRNGKey(30), (slots, 1, n_q, d))
    out = paged_decode_attention(q, cache, state)

    k_full = jnp.concatenate(ks, axis=1)
    v_full = jnp.concatenate(vs, axis=1)
    ref = dot_product_attention(q[:1], k_full, v_full, None)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref[0]), atol=1e-5)
    # slot 1 was never prefilled: seq_len 0 -> inactive
    assert int(state.seq_lens[1]) == 0
