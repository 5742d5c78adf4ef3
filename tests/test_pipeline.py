"""Pipeline parallelism: output AND gradient equality vs the scanned decoder
(the reference's correctness bar, pipeline_parallelism_test.py:38
assert_same_output_and_grad)."""

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import create_device_mesh

BASE = [
    "base_emb_dim=64",
    "base_mlp_dim=128",
    "base_num_query_heads=2",
    "base_num_kv_heads=2",
    "head_dim=32",
    "vocab_size=256",
    "max_target_length=32",
    "per_device_batch_size=1",
    "dtype=float32",
    "attention=dot_product",
]


def _loss_fn(model, params, tokens, positions, segs):
    logits = model.apply(params, tokens, positions, segs)
    return jnp.mean(jnp.square(logits))


def _remap_scan_to_pipeline(p_scan, p_pipe_shape, stages, repeats):
    """Scan params are stacked [U,...] in layer order u=r*S+s under
    decoder/layers/...; the pipeline nests them under decoder/layers/layers/
    in stage-major order u=s*R+r. Remap both path and permutation."""
    fs_scan = flax.traverse_util.flatten_dict(nn.meta.unbox(p_scan)["params"])
    fs_pipe = flax.traverse_util.flatten_dict(nn.meta.unbox(p_pipe_shape)["params"])
    perm = np.zeros(stages * repeats, np.int32)
    for r in range(repeats):
        for s in range(stages):
            perm[s * repeats + r] = r * stages + s
    out = {}
    for k in fs_pipe:
        if k[:2] == ("decoder", "layers") and len(k) > 2 and k[2] == "layers":
            v = fs_scan[("decoder", "layers") + k[3:]]
            out[k] = v[perm]
        else:
            out[k] = fs_scan[k]
    return {"params": flax.traverse_util.unflatten_dict(out)}


@pytest.mark.parametrize("stages,repeats,microbatches", [
    (4, 1, 4),
    (2, 2, 4),   # circular schedule with circ storage
    (4, 2, 8),
])
def test_pipeline_matches_scan_output_and_grad(stages, repeats, microbatches):
    layers = stages * repeats
    cfg_scan = load_config(BASE + [f"base_num_decoder_layers={layers}", "scan_layers=true"])
    cfg_pipe = load_config(
        BASE
        + [
            f"base_num_decoder_layers={layers}",
            f"ici_stage_parallelism={stages}",
            f"ici_fsdp_parallelism={8 // stages}",
            f"num_pipeline_microbatches={microbatches}",
            f"num_pipeline_repeats={repeats}",
        ]
    )
    mesh = create_device_mesh(cfg_pipe)

    m_scan = Transformer(cfg=cfg_scan)
    m_pipe = Transformer(cfg=cfg_pipe, mesh=mesh)

    B, L = 8, 32
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (B, L), 0, cfg_scan.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(L), (B, L))
    segs = jnp.ones((B, L), jnp.int32)

    p_scan = m_scan.init(key, tokens, positions, segs)
    p_pipe_shape = jax.eval_shape(m_pipe.init, key, tokens, positions, segs)
    p_pipe = _remap_scan_to_pipeline(p_scan, p_pipe_shape, stages, repeats)

    out_scan = m_scan.apply(p_scan, tokens, positions, segs)
    with mesh:
        out_pipe = m_pipe.apply(p_pipe, tokens, positions, segs)
    np.testing.assert_allclose(
        np.asarray(out_scan), np.asarray(out_pipe), atol=2e-4
    )

    g_scan = jax.grad(lambda p: _loss_fn(m_scan, p, tokens, positions, segs))(
        nn.meta.unbox(p_scan)
    )
    with mesh:
        g_pipe = jax.grad(lambda p: _loss_fn(m_pipe, p, tokens, positions, segs))(p_pipe)

    # permute pipeline grads back to scan order/paths for comparison
    fs_scan = flax.traverse_util.flatten_dict(g_scan["params"])
    fs_pipe = flax.traverse_util.flatten_dict(g_pipe["params"])
    perm = np.zeros(stages * repeats, np.int32)
    for r in range(repeats):
        for s in range(stages):
            perm[r * stages + s] = s * repeats + r
    for k_pipe, v_pipe in fs_pipe.items():
        if k_pipe[:2] == ("decoder", "layers") and len(k_pipe) > 2 and k_pipe[2] == "layers":
            k_scan = ("decoder", "layers") + k_pipe[3:]
            v_pipe = v_pipe[perm]
        else:
            k_scan = k_pipe
        np.testing.assert_allclose(
            np.asarray(fs_scan[k_scan]), np.asarray(v_pipe), atol=5e-4, err_msg=str(k_scan)
        )


def test_delayed_activation_forwarding_matches():
    """pipeline_delay_activation_forwarding must not change outputs — only
    the schedule (reference pipeline_parallelism_test.py equality bar)."""
    base = [
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=4",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=16",
        "vocab_size=256", "max_target_length=32", "per_device_batch_size=1",
        "ici_stage_parallelism=4", "num_pipeline_microbatches=8",
        "dtype=float32", "weight_dtype=float32",
    ]
    outs = []
    for delay in ("false", "true"):
        cfg = load_config(base + [f"pipeline_delay_activation_forwarding={delay}"])
        mesh = create_device_mesh(cfg)
        model = Transformer(cfg=cfg, mesh=mesh)
        rng = jax.random.PRNGKey(0)
        tokens = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, size=(8, 32)), jnp.int32
        )
        positions = jnp.broadcast_to(jnp.arange(32), (8, 32))
        segs = jnp.ones((8, 32), jnp.int32)
        with mesh:
            variables = model.init(rng, tokens, positions, segs)
            outs.append(np.asarray(model.apply(variables, tokens, positions, segs)))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-5)
