"""Mesh + sharding-rule tests (mirrors reference sharding tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.parallel import (
    assert_params_sufficiently_sharded,
    create_device_mesh,
    logical_to_mesh_axes,
    logical_to_sharding,
    mesh_shape_summary,
)


def test_mesh_fsdp8():
    cfg = load_config([])
    mesh = create_device_mesh(cfg)
    assert mesh.shape["fsdp"] == 8
    assert mesh_shape_summary(mesh) == {"fsdp": 8}


def test_mesh_2d():
    cfg = load_config(["ici_fsdp_parallelism=4", "ici_tensor_parallelism=2"])
    mesh = create_device_mesh(cfg)
    assert mesh.shape["fsdp"] == 4
    assert mesh.shape["tensor"] == 2
    assert mesh.devices.size == 8


def test_logical_rules_resolution():
    spec = logical_to_mesh_axes(("activation_batch", "activation_length", "activation_embed"))
    assert spec[0] == ("data", "fsdp", "fsdp_transpose", "expert")
    assert spec[1] == ("sequence", "context")
    assert spec[2] == ("tensor", "tensor_transpose")


def test_logical_rules_duplicate_mesh_axis_dropped():
    # "embed" and "mlp" both want fsdp_transpose/tensor axes; the second
    # occurrence must not double-assign a mesh axis.
    spec = logical_to_mesh_axes(("embed", "mlp"))
    used = []
    for entry in spec:
        if entry is None:
            continue
        used.extend(entry if isinstance(entry, tuple) else (entry,))
    assert len(used) == len(set(used))


def test_sharded_array_placement():
    cfg = load_config(["ici_fsdp_parallelism=4", "ici_tensor_parallelism=2"])
    mesh = create_device_mesh(cfg)
    sharding = logical_to_sharding(("embed", "mlp"), mesh)
    x = jax.device_put(jnp.zeros((64, 128)), sharding)
    # embed -> fsdp(4), mlp -> tensor(2): each shard is (16, 64)
    shard_shape = x.sharding.shard_shape(x.shape)
    assert shard_shape == (16, 64)


def test_assert_sufficiently_sharded():
    cfg = load_config([])
    mesh = create_device_mesh(cfg)
    good = jax.device_put(
        jnp.zeros((64, 64)), NamedSharding(mesh, PartitionSpec("fsdp", None))
    )
    frac = assert_params_sufficiently_sharded({"w": good}, mesh)
    assert frac == 0.0

    bad = jax.device_put(jnp.zeros((64, 64)), NamedSharding(mesh, PartitionSpec()))
    with pytest.raises(AssertionError, match="replicated"):
        assert_params_sufficiently_sharded({"w": bad}, mesh)
