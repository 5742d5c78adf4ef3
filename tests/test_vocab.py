"""Vocab mapping + expansion tests.

The soft-token off-by-one is the silent-corruption hazard the reference
warns about (SURVEY.md §7) — exhaustively tested here, including parity with
the reference's mapping JSON semantics.
"""

import json
import os

import numpy as np
import pytest

from maxtext_indextts2_tpu.vocab.mapping import (
    AudioVocabMapping,
    build_mapping,
)

REF_JSON = "/root/reference/audio_token_mapping_adjusted.json"


def test_soft_token_skip_arithmetic():
    m = build_mapping(
        original_vocab_size=1000, codebook_size=16, soft_token_index=500
    )
    # below the soft token: identity
    assert m.token_to_embedding(499) == 499
    # above: shifted down by one
    assert m.token_to_embedding(501) == 500
    assert m.embedding_to_token(500) == 501
    with pytest.raises(ValueError):
        m.token_to_embedding(500)
    # round trip everywhere
    for t in list(range(500)) + list(range(501, 1100)):
        assert m.embedding_to_token(m.token_to_embedding(t)) == t


def test_build_mapping_reuse_and_append():
    reuse = [6, 7, 8, 9]
    m = build_mapping(100, codebook_size=10, reusable_token_indices=reuse)
    # first 4 audio ids reuse, rest appended at 100..105
    assert [m.audio_to_token[a] for a in range(4)] == reuse
    assert m.audio_to_token[4] == 100
    assert m.audio_to_token[9] == 105
    # markers appended after codebook
    assert m.audio_to_token[m.marker_bt_audio_id] == 106
    assert m.audio_to_token[m.marker_ba_audio_id] == 107
    # padded to multiple of 128
    assert m.adjusted_vocab_size % 128 == 0


def test_arrays_roundtrip():
    m = build_mapping(100, codebook_size=10, reusable_token_indices=[6, 7],
                      soft_token_index=50)
    a2e = m.audio_to_embedding_array()
    e2a = m.embedding_to_audio_array()
    for a in range(12):  # 10 codebook + 2 markers
        e = a2e[a]
        assert e >= 0
        assert e2a[e] == a
    # non-audio rows are -1
    assert e2a[0] == -1


def test_json_roundtrip(tmp_path):
    m = build_mapping(1000, codebook_size=32, reusable_token_indices=[6, 7, 8],
                      soft_token_index=500)
    path = str(tmp_path / "mapping.json")
    m.save(path)
    m2 = AudioVocabMapping.from_json(path)
    assert m2.soft_token_index == 500
    assert m2.audio_to_token == m.audio_to_token
    np.testing.assert_array_equal(
        m.audio_to_embedding_array(), m2.audio_to_embedding_array()
    )


@pytest.mark.skipif(not os.path.exists(REF_JSON), reason="reference not mounted")
def test_reference_mapping_parity():
    """Loading the reference's JSON must reproduce its embedding indices."""
    m = AudioVocabMapping.from_json(REF_JSON)
    assert m.soft_token_index == 262144
    raw = json.load(open(REF_JSON))
    a2e_ref = raw["audio_to_embedding"]
    for a_str, e_ref in list(a2e_ref.items())[:2000] + list(a2e_ref.items())[-2000:]:
        assert m.audio_to_embedding(int(a_str)) == int(e_ref), a_str
    # spot-check above the soft token: audio 6242 sits at token 262145 -> row 262144
    assert m.audio_to_token[6242] == 262145
    assert m.audio_to_embedding(6242) == 262144


def test_expand_embeddings():
    import jax
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.vocab.expand import expand_embeddings

    params = {
        "params": {
            "token_embedder": {"embedding": jnp.ones((100, 16))},
            "logits_dense": {"kernel": jnp.ones((16, 100))},
            "other": {"w": jnp.zeros((4,))},
        }
    }
    out = expand_embeddings(params, 28)
    emb = out["params"]["token_embedder"]["embedding"]
    kern = out["params"]["logits_dense"]["kernel"]
    assert emb.shape == (128, 16)
    assert kern.shape == (16, 128)
    # old rows intact
    np.testing.assert_array_equal(np.asarray(emb[:100]), np.ones((100, 16)))
    # new rows small-but-nonzero
    new = np.asarray(emb[100:])
    assert 0 < np.abs(new).mean() < 0.05
    # deterministic under same seed
    out2 = expand_embeddings(params, 28)
    np.testing.assert_array_equal(
        np.asarray(out["params"]["token_embedder"]["embedding"]),
        np.asarray(out2["params"]["token_embedder"]["embedding"]),
    )
