"""Checkpoint save/restore integration test (mirrors reference
tests/integration_tests/checkpointing_test.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import create_device_mesh
from maxtext_indextts2_tpu.train.checkpointing import (
    CheckpointManager,
    load_params_only,
    save_params_only,
)
from maxtext_indextts2_tpu.train.train import setup_train_state

SMALL = [
    "base_emb_dim=128",
    "base_mlp_dim=256",
    "base_num_decoder_layers=2",
    "base_num_query_heads=4",
    "base_num_kv_heads=4",
    "head_dim=32",
    "vocab_size=512",
    "max_target_length=64",
]


def _state(cfg, mesh, seed=0):
    model = Transformer(cfg=cfg, mesh=mesh)
    return setup_train_state(cfg, model, mesh, jax.random.PRNGKey(seed))[0]


def test_save_restore_roundtrip(tmp_path):
    cfg = load_config(SMALL + [f"checkpoint_dir={tmp_path}/ckpt", "async_checkpointing=false"])
    mesh = create_device_mesh(cfg)
    state = _state(cfg, mesh)

    mgr = CheckpointManager(cfg)
    assert mgr.maybe_restore(state) is None  # empty dir
    mgr.save(3, state)
    mgr.wait()

    state2 = _state(cfg, mesh, seed=1)  # different init
    restored = mgr.maybe_restore(state2)
    mgr.close()
    assert restored is not None
    l1 = jax.tree.leaves(state.params)
    l2 = jax.tree.leaves(restored.params)
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # restored arrays keep the target sharding
    assert restored.params["token_embedder"]["embedding"].sharding.is_equivalent_to(
        state2.params["token_embedder"]["embedding"].sharding, 2
    )


def test_params_only_roundtrip(tmp_path):
    cfg = load_config(SMALL)
    mesh = create_device_mesh(cfg)
    state = _state(cfg, mesh)
    path = str(tmp_path / "params_only")
    save_params_only(path, state.params)
    out = load_params_only(path, state.params)
    np.testing.assert_array_equal(
        np.asarray(out["token_embedder"]["embedding"]),
        np.asarray(state.params["token_embedder"]["embedding"]),
    )
