"""MoE tests (mirrors reference MaxText/tests/moe_test.py: dense-vs-sparse
parity, load-balance loss, routing)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models.moe import RoutedMoE

BASE = [
    "base_emb_dim=64",
    "base_mlp_dim=128",
    "moe_mlp_dim=128",
    "num_experts=4",
    "num_experts_per_tok=2",
    "vocab_size=256",
]


def _run(cfg_args, x=None, seed=0):
    cfg = load_config(BASE + cfg_args)
    moe = RoutedMoE(cfg=cfg)
    if x is None:
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)
    params = moe.init(jax.random.PRNGKey(seed), x)
    (out, lb), _ = moe.apply(params, x, mutable=[])
    return cfg, params, x, out, lb


def test_moe_forward_shape_and_loss():
    cfg, params, x, out, lb = _run(["dtype=float32"])
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # perfectly balanced routing gives lb_loss == 1.0; anything in [0.9, 4]
    assert 0.5 < float(lb) < 4.0


def test_dense_vs_sparse_parity():
    """The ragged_dot sparse path must equal the dense einsum path."""
    cfg = load_config(BASE + ["dtype=float32"])
    moe = RoutedMoE(cfg=cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)
    params = moe.init(jax.random.PRNGKey(0), x)

    bound = moe.bind(params)
    top_idx = jnp.array([[[0, 1]] * 8, [[2, 3]] * 8], jnp.int32)
    top_w = jnp.full((2, 8, 2), 0.5, jnp.float32)
    p = params["params"]
    import flax

    unboxed = flax.linen.meta.unbox(p)
    wi_0, wi_1, wo = unboxed["wi_0"], unboxed["wi_1"], unboxed["wo"]
    dense = bound._dense_experts(x, top_idx, top_w, wi_0, wi_1, wo, jnp.float32)
    sparse = bound._sparse_experts(x, top_idx, top_w, wi_0, wi_1, wo, jnp.float32)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse), atol=2e-5)


def test_int8_expert_serving_path():
    """int8w_serve MoE: quantize_params_for_serving fills the int8+scale
    expert structure from float params, the sparse int8 ragged_dot path
    matches the f32 sparse path within quantization tolerance, and the
    dense fallback (CPU) matches too. Reference capability: megablox gmm's
    AQT-aware quantized expert matmul (kernels/megablox/gmm.py)."""
    import flax

    from maxtext_indextts2_tpu.ops.quantization import (
        quantize_params_for_serving,
    )

    cfg_f32 = load_config(BASE + ["dtype=float32"])
    cfg_q = load_config(BASE + ["dtype=float32", "quantization=int8w_serve"])
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 64), jnp.float32)

    moe_f32 = RoutedMoE(cfg=cfg_f32)
    params = moe_f32.init(jax.random.PRNGKey(0), x)

    moe_q = RoutedMoE(cfg=cfg_q)
    abstract = flax.linen.meta.unbox(
        jax.eval_shape(lambda: moe_q.init(jax.random.PRNGKey(0), x))["params"]
    )
    qp = quantize_params_for_serving(
        flax.linen.meta.unbox(params["params"]), abstract
    )
    assert qp["wi_0"].dtype == jnp.int8
    assert qp["wi_0_scale"].shape == (4, 1, 128)

    # full module forward (dense dequant fallback on CPU)
    (out_f32, _), _ = moe_f32.apply(params, x, mutable=[])
    (out_q, _), _ = moe_q.apply({"params": qp}, x, mutable=[])
    err = np.abs(np.asarray(out_q) - np.asarray(out_f32)).max()
    assert err < 0.05 * max(1e-9, np.abs(np.asarray(out_f32)).max()), err

    # the sparse int8 x int8 ragged_dot path itself
    p = flax.linen.meta.unbox(params["params"])
    top_idx = jnp.array([[[0, 1]] * 8, [[2, 3]] * 8], jnp.int32)
    top_w = jnp.full((2, 8, 2), 0.5, jnp.float32)
    ref = moe_f32.bind(params)._sparse_experts(
        x, top_idx, top_w, p["wi_0"], p["wi_1"], p["wo"], jnp.float32
    )
    got = moe_q.bind({"params": qp})._sparse_experts(
        x, top_idx, top_w, qp["wi_0"], qp["wi_1"], qp["wo"], jnp.float32,
        scales=(qp["wi_0_scale"], qp["wi_1_scale"], qp["wo_scale"]),
    )
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.05 * max(1e-9, np.abs(np.asarray(ref)).max()), err


def test_sigmoid_scores_and_bias():
    _, _, _, out, lb = _run(["routed_score_func=sigmoid", "routed_bias=true", "dtype=float32"])
    assert np.isfinite(np.asarray(out)).all()


def test_group_limited_routing():
    _, _, _, out, _ = _run(
        ["n_routing_groups=2", "topk_routing_group=1", "dtype=float32"]
    )
    assert np.isfinite(np.asarray(out)).all()


def test_shared_experts():
    cfg, params, x, out, _ = _run(["shared_experts=1", "dtype=float32"])
    assert "shared_experts" in params["params"]


def test_moe_in_transformer_train():
    """mixtral-style decoder trains a step with lb loss in metrics."""
    from maxtext_indextts2_tpu.train.train import train_loop

    cfg = load_config(
        BASE
        + [
            "decoder_block=mixtral",
            "base_num_decoder_layers=2",
            "base_num_query_heads=2",
            "base_num_kv_heads=2",
            "head_dim=32",
            "max_target_length=32",
            "steps=2",
            "scan_layers=true",
            "dtype=float32",
        ]
    )
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
    assert "moe_lb_loss" in metrics


def test_deepseek_dense_then_moe_layers():
    from maxtext_indextts2_tpu.train.train import train_loop

    cfg = load_config(
        BASE
        + [
            "decoder_block=deepseek",
            "base_num_decoder_layers=4",
            "first_num_dense_layers=2",
            "base_num_query_heads=2",
            "base_num_kv_heads=2",
            "head_dim=32",
            "max_target_length=32",
            "steps=2",
            "scan_layers=true",
            "dtype=float32",
        ]
    )
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
