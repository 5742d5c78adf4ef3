"""Flash-attention kernel tests (interpret mode on CPU) — parity with the
dot-product reference across mask variants, gradients, GQA, and the
context-parallel shard_map wrapper with load-balanced reordering.

Mirrors the reference's attention_test.py strategy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.models.attention import (
    dot_product_attention,
    make_attention_mask,
)
from maxtext_indextts2_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_sharded,
    load_balanced_inverse,
    load_balanced_reorder,
)


def _ref(q, k, v, pos, seg, causal=True, sw=0, cs=0, cap=0.0):
    qb, kb, vb = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    mask = make_attention_mask(pos, pos, seg, seg, causal, sw, cs)
    return jnp.swapaxes(dot_product_attention(qb, kb, vb, mask, cap, True), 1, 2)


def _inputs(B=2, H=4, HKV=2, S=256, D=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, H, S, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, HKV, S, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, HKV, S, D), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    seg = jnp.where(jnp.arange(S) < 200, 1, 0).astype(jnp.int32)
    seg = jnp.broadcast_to(seg[None], (B, S))
    return q, k, v, pos, seg


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(sliding_window=32),
        dict(chunk_size=64),
        dict(soft_cap=20.0),
        dict(causal=False),
    ],
)
def test_forward_and_grad_parity(kwargs):
    q, k, v, pos, seg = _inputs()
    causal = kwargs.get("causal", True)
    sw = kwargs.get("sliding_window", 0)
    cs = kwargs.get("chunk_size", 0)
    cap = kwargs.get("soft_cap", 0.0)
    valid = (seg != 0)[:, None, :, None]

    o1 = flash_attention(q, k, v, pos, pos, seg, seg, causal, sw, cs, cap, None, 128, 128)
    o2 = _ref(q, k, v, pos, seg, causal, sw, cs, cap)
    np.testing.assert_allclose(
        np.asarray(jnp.where(valid, o1, 0)), np.asarray(jnp.where(valid, o2, 0)), atol=2e-5
    )

    f1 = lambda q, k, v: jnp.sum(
        jnp.where(valid, flash_attention(q, k, v, pos, pos, seg, seg, causal, sw, cs, cap, None, 128, 128), 0.0) ** 2
    )
    f2 = lambda q, k, v: jnp.sum(jnp.where(valid, _ref(q, k, v, pos, seg, causal, sw, cs, cap), 0.0) ** 2)
    g1 = jax.grad(f1, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(f2, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_packed_segments():
    q, k, v, pos, _ = _inputs(S=256)
    seg = jnp.concatenate(
        [jnp.full(128, 1, jnp.int32), jnp.full(128, 2, jnp.int32)]
    )[None, :].repeat(2, 0)
    o1 = flash_attention(q, k, v, pos, pos, seg, seg, True, 0, 0, 0.0, None, 128, 128)
    o2 = _ref(q, k, v, pos, seg)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=2e-5)


def test_load_balanced_reorder_roundtrip():
    x = jnp.arange(2 * 64 * 3).reshape(2, 64, 3)
    for cp in (2, 4, 8):
        y = load_balanced_reorder(x, cp)
        z = load_balanced_inverse(y, cp)
        np.testing.assert_array_equal(np.asarray(x), np.asarray(z))


def test_context_parallel_sharded_matches_single():
    """CP=4 shard_map + load-balanced reorder must equal unsharded attention."""
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.parallel import create_device_mesh

    cfg = load_config(["ici_context_parallelism=4", "ici_fsdp_parallelism=2"])
    mesh = create_device_mesh(cfg)

    B, S, N, D = 2, 128, 4, 32
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    q = jax.random.normal(ks[0], (B, S, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, N, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, N, D), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    seg = jnp.ones((B, S), jnp.int32)

    # ground truth, unsharded
    ref = _ref(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2), pos, seg
    )
    ref = jnp.swapaxes(ref, 1, 2)

    # load-balance reorder the whole batch, run CP-sharded, undo
    cp = 4
    qr = load_balanced_reorder(q, cp)
    kr = load_balanced_reorder(k, cp)
    vr = load_balanced_reorder(v, cp)
    pr = load_balanced_reorder(pos, cp)
    sr = load_balanced_reorder(seg, cp)

    with mesh:
        out = jax.jit(
            lambda q, k, v, p, s: flash_attention_sharded(
                q, k, v, s, mesh=mesh, positions=p, block_q=32, block_kv=32
            )
        )(qr, kr, vr, pr, sr)
    out = load_balanced_inverse(out, cp)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)
