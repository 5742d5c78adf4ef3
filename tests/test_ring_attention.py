"""Ring-attention tests (interpret mode on the 8-device CPU mesh).

Ring context parallelism keeps K/V sequence-sharded and rotates shards with
ppermute (ops/ring_attention.py) — beyond the reference's all-gather-KV CP
(SURVEY.md §2.4: "NOT ring attention"). Output AND gradient parity vs the
unsharded kernel, with load-balanced reordering, packed segments, GQA, and
sliding windows.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.ops.flash_attention import (
    flash_attention,
    flash_attention_sharded,
    load_balanced_inverse,
    load_balanced_reorder,
)
from maxtext_indextts2_tpu.parallel import create_device_mesh

CP = 4


def _mesh():
    cfg = load_config(["ici_context_parallelism=4", "ici_fsdp_parallelism=2"])
    return create_device_mesh(cfg)


def _inputs(B=2, S=128, N=4, NKV=4, D=32, seed=0, packed=False):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    q = jax.random.normal(ks[0], (B, S, N, D), jnp.float32)
    k = jax.random.normal(ks[1], (B, S, NKV, D), jnp.float32)
    v = jax.random.normal(ks[2], (B, S, NKV, D), jnp.float32)
    pos = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
    if packed:
        # two packed documents + trailing padding (seg 0)
        seg = jnp.where(jnp.arange(S) < S // 2, 1, 2)
        seg = jnp.where(jnp.arange(S) >= S - 16, 0, seg).astype(jnp.int32)
        pos = jnp.where(jnp.arange(S) < S // 2,
                        jnp.arange(S), jnp.arange(S) - S // 2)[None]
        pos = jnp.broadcast_to(pos, (B, S)).astype(jnp.int32)
        seg = jnp.broadcast_to(seg[None], (B, S))
    else:
        seg = jnp.ones((B, S), jnp.int32)
    return q, k, v, pos, seg


def _run_sharded(mesh, algorithm, q, k, v, pos, seg, load_balanced=True, **kw):
    if load_balanced:
        q, k, v, pos, seg = (load_balanced_reorder(x, CP) for x in (q, k, v, pos, seg))
    with mesh:
        out = jax.jit(
            lambda q, k, v, p, s: flash_attention_sharded(
                q, k, v, s, mesh=mesh, positions=p,
                block_q=16, block_kv=16, algorithm=algorithm, **kw
            )
        )(q, k, v, pos, seg)
    if load_balanced:
        out = load_balanced_inverse(out, CP)
    return out


@pytest.mark.parametrize("load_balanced", [True, False])
@pytest.mark.parametrize("packed", [False, True])
def test_ring_matches_allgather_forward(load_balanced, packed):
    mesh = _mesh()
    q, k, v, pos, seg = _inputs(packed=packed)
    want = _run_sharded(mesh, "allgather", q, k, v, pos, seg, load_balanced)
    got = _run_sharded(mesh, "ring", q, k, v, pos, seg, load_balanced)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ring_matches_unsharded_gqa_sliding_window():
    mesh = _mesh()
    q, k, v, pos, seg = _inputs(NKV=2)
    ref = flash_attention(
        jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
        pos, pos, seg, seg, True, 32, 0, 0.0, None, 16, 16,
    )
    ref = jnp.swapaxes(ref, 1, 2)
    got = _run_sharded(mesh, "ring", q, k, v, pos, seg, sliding_window=32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_ring_gradient_parity():
    """d(loss)/d{q,k,v} through the ring (ppermute fwd + traveling dK/dV bwd)
    must equal the all-gather CP path's gradients."""
    mesh = _mesh()
    q, k, v, pos, seg = _inputs()

    def loss(algorithm, q, k, v):
        out = _run_sharded(mesh, algorithm, q, k, v, pos, seg)
        # weighted sum so every output element has a distinct cotangent
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) / out.size
        return jnp.sum(out * w)

    want = jax.grad(lambda *a: loss("allgather", *a), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(lambda *a: loss("ring", *a), argnums=(0, 1, 2))(q, k, v)
    for g, wgrad, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wgrad), atol=3e-5, err_msg=f"d{name}"
        )


def test_ring_config_threading():
    """context_parallel_algorithm=ring flows config -> decoder -> attention,
    and the full train step compiles + runs on a CP mesh."""
    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
    from maxtext_indextts2_tpu.train.train import (
        batch_sharding,
        jit_train_step,
        setup_train_state,
    )

    cfg = load_config([
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=16",
        "vocab_size=128", "max_target_length=128", "per_device_batch_size=2",
        "dtype=float32", "attention=flash", "flash_block_sizes=[16,16]",
        "ici_context_parallelism=4", "ici_fsdp_parallelism=2",
        "context_parallel_algorithm=ring",
    ])
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    p_step = jit_train_step(model, cfg, mesh, shardings)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)),
        next(SyntheticDataIterator(cfg)),
    )
    with mesh:
        _, metrics = p_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["loss"]))


def test_ring_algorithm_validation():
    with pytest.raises(ValueError, match="context_parallel_algorithm"):
        load_config(["context_parallel_algorithm=sequence_ring"])


@pytest.mark.parametrize("packed", [False, True])
def test_ulysses_matches_allgather(packed):
    """Ulysses (all-to-all seq<->head re-shard) forward parity vs the
    all-gather CP path."""
    mesh = _mesh()
    q, k, v, pos, seg = _inputs(packed=packed)
    want = _run_sharded(mesh, "allgather", q, k, v, pos, seg)
    got = _run_sharded(mesh, "ulysses", q, k, v, pos, seg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_ulysses_gradient_parity():
    mesh = _mesh()
    q, k, v, pos, seg = _inputs()

    def loss(algorithm, q, k, v):
        out = _run_sharded(mesh, algorithm, q, k, v, pos, seg)
        w = jnp.arange(out.size, dtype=jnp.float32).reshape(out.shape) / out.size
        return jnp.sum(out * w)

    want = jax.grad(lambda *a: loss("allgather", *a), argnums=(0, 1, 2))(q, k, v)
    got = jax.grad(lambda *a: loss("ulysses", *a), argnums=(0, 1, 2))(q, k, v)
    for g, wgrad, name in zip(got, want, "qkv"):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(wgrad), atol=3e-5, err_msg=f"d{name}"
        )


def test_ulysses_rejects_indivisible_heads():
    """cp=4 with only 2 kv heads: ulysses must refuse with a clear error
    (ring handles that case)."""
    mesh = _mesh()
    q, k, v, pos, seg = _inputs(NKV=2)
    with pytest.raises(ValueError, match="ulysses"):
        _run_sharded(mesh, "ulysses", q, k, v, pos, seg)
