"""Elastic recovery + debug utility tests (reference: elastic_train_test.py
with mocked failures; NaN finder; sharding dump diffs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.train.elastic import elastic_train_loop
from maxtext_indextts2_tpu.utils.debug import (
    assert_finite,
    diff_shardings_vs_golden,
    dump_shardings,
    find_nan_inf,
    save_sharding_golden,
)

SMALL = [
    "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
    "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
    "vocab_size=256", "max_target_length=64", "dtype=float32",
    "steps=8", "warmup_steps_fraction=0",
]


def test_elastic_recovers_from_injected_failure():
    fails = {"armed": True}

    def injector(step):
        if step == 5 and fails["armed"]:
            fails["armed"] = False
            raise RuntimeError("injected device failure")

    cfg = load_config(SMALL)
    metrics = elastic_train_loop(cfg, snapshot_period=2, failure_injector=injector)
    assert metrics["recoveries"] == 1
    assert metrics["final_step"] == 8
    assert np.isfinite(metrics["loss"])


def test_elastic_gives_up_after_max_recoveries(tmp_path):
    def injector(step):
        if step == 2:
            raise RuntimeError("permanent failure")

    cfg = load_config(SMALL + [f"base_output_directory={tmp_path}"])
    with pytest.raises(RuntimeError, match="permanent failure"):
        elastic_train_loop(cfg, snapshot_period=2, failure_injector=injector,
                           max_recoveries=1)
    # emergency checkpoint landed on disk
    assert (tmp_path / "mtt-run" / "emergency").exists()


def test_elastic_live_resize_8_to_4_continues_training():
    """Reference elastic_train.py:91-170 maybe_reshard_down: lose half the
    world mid-run, rebuild the mesh over the survivors, reshard the snapshot
    onto it, and CONTINUE from the snapshot step — not restart-from-scratch."""
    world = {"devices": jax.devices()}
    assert len(world["devices"]) == 8
    fails = {"armed": True}

    def injector(step):
        if step == 5 and fails["armed"]:
            fails["armed"] = False
            world["devices"] = jax.devices()[:4]  # half the world dies
            raise RuntimeError("slice lost")

    cfg = load_config(SMALL + ["per_device_batch_size=1"])
    assert cfg.global_batch_size_to_train_on == 8
    metrics = elastic_train_loop(
        cfg, snapshot_period=2, failure_injector=injector,
        devices_fn=lambda: world["devices"],
    )
    assert metrics["recoveries"] == 1
    assert metrics["final_step"] == 8  # continued to completion
    assert metrics["final_num_devices"] == 4
    # per-device batch stays fixed; the global batch scales with the world
    assert metrics["final_global_batch"] == 4
    assert np.isfinite(metrics["loss"])


def test_resize_config_rederives_parallelism_and_batch():
    from maxtext_indextts2_tpu.train.elastic import resize_config

    cfg = load_config(SMALL + ["ici_fsdp_parallelism=8", "per_device_batch_size=2"])
    assert cfg.num_devices == 8
    down = resize_config(cfg, 4)
    assert down.ici_fsdp_parallelism == 4
    assert down.global_batch_size_to_train_on == 8  # 2 * 4
    assert down.num_devices == 4
    # original config untouched (recovery may later resize back up)
    assert cfg.ici_fsdp_parallelism == 8
    up = resize_config(down, 8)
    assert up.ici_fsdp_parallelism == 8
    assert up.global_batch_size_to_train_on == 16
    # same-size resize is the identity
    assert resize_config(cfg, 8) is cfg


def test_nan_finder():
    tree = {"a": jnp.ones(4), "b": jnp.array([1.0, jnp.nan, jnp.inf, 2.0])}
    bad = find_nan_inf(tree)
    assert len(bad) == 1 and "b" in bad[0] and "2/4" in bad[0]
    with pytest.raises(FloatingPointError):
        assert_finite(tree)
    assert_finite({"a": jnp.ones(4)})  # clean tree passes


def test_sharding_dump_and_diff(tmp_path):
    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.train import setup_train_state

    cfg = load_config(SMALL + ["ici_fsdp_parallelism=4", "ici_tensor_parallelism=2"])
    mesh = create_device_mesh(cfg)
    state, _ = setup_train_state(cfg, Transformer(cfg=cfg, mesh=mesh), mesh,
                                 jax.random.PRNGKey(0))
    golden = tmp_path / "golden.json"
    save_sharding_golden(state.params, str(golden))
    assert diff_shardings_vs_golden(state.params, str(golden)) == []
    # a resharded tree must be flagged
    import jax as j
    from jax.sharding import NamedSharding, PartitionSpec

    repl = j.tree.map(
        lambda x: j.device_put(x, NamedSharding(mesh, PartitionSpec())), state.params
    )
    diffs = diff_shardings_vs_golden(repl, str(golden))
    assert len(diffs) > 0
