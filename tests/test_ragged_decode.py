"""Ragged decode attention kernel + engine integration.

Reference: MaxText/inference/paged_attention_kernel_v2.py (ragged paged
decode); here a dense-cache ragged kernel with clamped-index DMA skipping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
    ragged_decode_attention,
    ragged_decode_attention_reference,
)


def _unrolled(cfg):
    """Engines auto-unroll scan layers for decode (serve_unroll_layers); a
    comparison Engine that receives those params directly must build its
    model unrolled too."""
    import dataclasses

    return dataclasses.replace(cfg, scan_layers=False)


def test_kernel_matches_reference():
    rng = np.random.default_rng(0)
    B, S, d = 4, 512, 128
    lengths = jnp.asarray([1, 200, 256, 512], jnp.int32)
    for nq, nkv in [(8, 2), (8, 8), (4, 1)]:
        q = jnp.asarray(rng.normal(size=(B, nq, d)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
        ref = ragged_decode_attention_reference(q, k, v, lengths)
        out = ragged_decode_attention(q, k, v, lengths, block_kv=256, interpret=True)
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_engine_decode_with_ragged_kernel():
    """Greedy decode through the engine with decode_attention=ragged must
    equal argmax over the train-mode forward."""
    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=16", "per_device_batch_size=0.25",
        "decode_sampling_strategy=greedy", "dtype=float32",
        "decode_attention=ragged",
    ])
    eng = Engine(cfg)
    eng.load_params()
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = eng.generate_stream(prompt, 8)

    full = np.concatenate([prompt, np.array(out[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    positions = jnp.arange(tokens.shape[1])[None, :]
    segs = jnp.ones_like(tokens)
    logits = eng.model.apply({"params": eng.params}, tokens, positions, segs)
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    assert out == preds[len(prompt) - 1 :].tolist()


def test_kernel_int8_kv_matches_dequantized():
    """In-kernel int8 dequantization must match dequantize-then-attend."""
    from maxtext_indextts2_tpu.ops.quantization import dequantize_kv, quantize_kv

    rng = np.random.default_rng(0)
    B, S, nq, nkv, d = 2, 256, 8, 2, 128
    lengths = jnp.asarray([100, 256], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = ragged_decode_attention_reference(
        q, dequantize_kv(kq, ks, jnp.float32), dequantize_kv(vq, vs, jnp.float32),
        lengths,
    )
    out = ragged_decode_attention(
        q, kq, vq, lengths, block_kv=128, interpret=True, k_scale=ks, v_scale=vs,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_engine_decode_ragged_int8_kv():
    """Engine greedy decode with decode_attention=ragged + int8 KV cache
    equals teacher-forced argmax (int8 rounding is identical both ways)."""
    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=16", "per_device_batch_size=0.125",
        "decode_sampling_strategy=greedy", "dtype=float32",
        "decode_attention=ragged", "quantize_kvcache=true",
    ])
    eng = Engine(cfg)
    eng.load_params()
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = eng.generate_stream(prompt, 8)
    # consistency vs the masked-dot-product int8 engine
    cfg2 = load_config([a for a in [
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=16", "per_device_batch_size=0.125",
        "decode_sampling_strategy=greedy", "dtype=float32",
        "quantize_kvcache=true",
    ]])
    # params are in the engine's (unrolled) layout: build the comparison
    # engine unrolled too
    eng2 = Engine(_unrolled(cfg2), params=eng.params)
    out2 = eng2.generate_stream(prompt, 8)
    assert out == out2


def test_kernel_sliding_window():
    rng = np.random.default_rng(1)
    B, S, nq, nkv, d = 3, 512, 8, 2, 128
    lengths = jnp.asarray([40, 257, 512], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    for w in (64, 130):
        ref = ragged_decode_attention_reference(q, k, v, lengths, sliding_window=w)
        out = ragged_decode_attention(
            q, k, v, lengths, block_kv=128, interpret=True, sliding_window=w
        )
        np.testing.assert_allclose(out, ref, atol=2e-5)


def test_engine_decode_ragged_sliding_window():
    """mistral-style sliding-window decode through the ragged kernel must
    equal the masked dot-product path."""
    base = [
        "decoder_block=mistral", "sliding_window_size=8",
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=16", "per_device_batch_size=0.125",
        "decode_sampling_strategy=greedy", "dtype=float32",
    ]
    eng_r = Engine(load_config(base + ["decode_attention=ragged"]))
    eng_r.load_params()
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out_r = eng_r.generate_stream(prompt, 12)  # crosses the window
    eng_m = Engine(_unrolled(load_config(base)), params=eng_r.params)
    out_m = eng_m.generate_stream(prompt, 12)
    assert out_r == out_m


@pytest.mark.parametrize("block", ["llama2", "gemma3", "qwen3"])
def test_engine_decode_matrix_ragged(block):
    """decode_attention=ragged across block styles (gemma3 exercises the
    sliding-window kernel path on 5 of 6 sublayers)."""
    n_layers = {"gemma3": 6}.get(block, 2)
    extra = (["sliding_window_size=8", "query_pre_attn_scalar=32"]
             if block == "gemma3" else [])
    cfg = load_config([
        f"decoder_block={block}", "base_emb_dim=128", "base_mlp_dim=256",
        f"base_num_decoder_layers={n_layers}", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=32", "vocab_size=512",
        "max_target_length=64", "max_prefill_predict_length=16",
        "per_device_batch_size=0.125", "decode_sampling_strategy=greedy",
        "dtype=float32", "decode_attention=ragged",
    ] + extra)
    eng = Engine(cfg)
    eng.load_params()
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = eng.generate_stream(prompt, 12)
    full = np.concatenate([prompt, np.array(out[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    positions = jnp.arange(tokens.shape[1])[None, :]
    segs = jnp.ones_like(tokens)
    logits = eng.model.apply({"params": eng.params}, tokens, positions, segs)
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    assert out == preds[len(prompt) - 1 :].tolist(), block


@pytest.mark.parametrize(
    "inner", [(2, 8), (16,), (2, 1)], ids=["kv", "mla_latent", "kv_scale"]
)
def test_inplace_row_update_kernel(inner):
    """Pallas in-place row update (interpret mode) == jnp scatter, and only
    the targeted rows change. Covers 4-D KV caches, 3-D MLA latent caches
    (unit-axis bitcast path), and quantization-scale shapes."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.ops.inplace_update import inplace_row_update

    b, s = 4, 32
    cache = jax.random.normal(jax.random.PRNGKey(0), (b, s) + inner, jnp.float32)
    rows = jax.random.normal(jax.random.PRNGKey(1), (b, 3) + inner, jnp.float32)
    idx = jnp.asarray([0, 5, 29, 31], jnp.int32)  # incl. clamped overflow

    got = inplace_row_update(cache, rows, idx, interpret=True)

    want = np.asarray(cache).copy()
    for i in range(b):
        for j in range(3):
            want[i, min(int(idx[i]) + j, s - 1)] = np.asarray(rows)[i, j]
    np.testing.assert_allclose(np.asarray(got), want, rtol=0, atol=0)


@pytest.mark.parametrize("window", [0, 64], ids=["full", "sliding"])
def test_kernel_v2_matches_reference(window):
    """Flash-decoding v2 kernel (per-slot dynamic block loop, manual DMAs)
    == masked reference, incl. edge lengths and sliding windows."""
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        ragged_decode_attention_v2,
    )

    rng = np.random.default_rng(3)
    B, S, nq, nkv, d = 4, 1024, 8, 2, 128
    lengths = jnp.asarray([1, 40, 513, 1024], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    ref = ragged_decode_attention_reference(q, k, v, lengths, sliding_window=window)
    out = ragged_decode_attention_v2(
        q, k, v, lengths, block_kv=256, interpret=True, sliding_window=window
    )
    np.testing.assert_allclose(out, ref, atol=2e-5)


@pytest.mark.parametrize("window", [0, 64], ids=["full", "sliding"])
def test_kernel_v2_int8_kv_matches_dequantized(window):
    """v2 in-VMEM int8 dequantization == dequantize-then-attend."""
    from maxtext_indextts2_tpu.ops.quantization import dequantize_kv, quantize_kv
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        ragged_decode_attention_v2,
    )

    rng = np.random.default_rng(5)
    B, S, nq, nkv, d = 3, 512, 8, 2, 128
    lengths = jnp.asarray([1, 100, 512], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    kq, ks = quantize_kv(k)
    vq, vs = quantize_kv(v)
    ref = ragged_decode_attention_reference(
        q, dequantize_kv(kq, ks, jnp.float32), dequantize_kv(vq, vs, jnp.float32),
        lengths, sliding_window=window,
    )
    out = ragged_decode_attention_v2(
        q, kq, vq, lengths, block_kv=128, interpret=True,
        k_scale=ks, v_scale=vs, sliding_window=window,
    )
    np.testing.assert_allclose(out, ref, atol=5e-5)


def test_paged_kernel_matches_reference():
    """paged_decode_attention_v2 (page-table-indirect flash decoding) must
    match masked attention over the contiguous equivalent."""
    from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
        paged_decode_attention_v2,
    )

    rng = np.random.default_rng(11)
    B, nq, nkv, d = 4, 8, 2, 128
    tpp, max_pages, num_pages = 64, 8, 64
    S = tpp * max_pages
    lengths = jnp.asarray([1, 63, 200, 512], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, nq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, S, nkv, d)), jnp.float32)

    # scatter each slot's valid tokens into a shuffled page pool
    perm = rng.permutation(np.arange(1, num_pages))  # page 0 reserved null
    key_pages = np.zeros((num_pages, tpp, nkv, d), np.float32)
    value_pages = np.zeros((num_pages, tpp, nkv, d), np.float32)
    page_map = np.zeros((B, max_pages), np.int32)
    nxt = 0
    for b in range(B):
        n = -(-int(lengths[b]) // tpp)
        for j in range(n):
            page = int(perm[nxt]); nxt += 1
            page_map[b, j] = page
            key_pages[page] = np.asarray(k[b, j * tpp:(j + 1) * tpp])
            value_pages[page] = np.asarray(v[b, j * tpp:(j + 1) * tpp])

    out = paged_decode_attention_v2(
        q, jnp.asarray(key_pages), jnp.asarray(value_pages),
        jnp.asarray(page_map), lengths, interpret=True,
    )
    ref = ragged_decode_attention_reference(q, k, v, lengths)
    np.testing.assert_allclose(out, ref, atol=2e-5)
