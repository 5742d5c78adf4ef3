"""AOT compile-for-topology tests (reference: train_compile_test.py — compile
for large topologies on CPU without hardware)."""

import pytest

from maxtext_indextts2_tpu.config import load_config

SMALL = [
    "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
    "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
    "vocab_size=512", "max_target_length=64",
]


@pytest.mark.parametrize("topo,parallel", [
    ("v5e-16", ["ici_fsdp_parallelism=8", "ici_tensor_parallelism=2"]),
    ("v5e-64", ["ici_fsdp_parallelism=16", "ici_tensor_parallelism=4"]),
    # ring / ulysses CP: proves the Pallas flash kernel + ppermute ring /
    # all-to-all re-shard lower through Mosaic for real TPU hardware
    ("v5e-8", ["ici_fsdp_parallelism=2", "ici_context_parallelism=4",
               "context_parallel_algorithm=ring", "attention=flash",
               "flash_block_sizes=[64,64]", "max_target_length=512"]),
    ("v5e-8", ["ici_fsdp_parallelism=2", "ici_context_parallelism=4",
               "context_parallel_algorithm=ulysses", "attention=flash",
               "flash_block_sizes=[64,64]", "max_target_length=512"]),
])
def test_aot_compile_topology(topo, parallel):
    from maxtext_indextts2_tpu.train.train_compile import (
        aot_compile_train_step,
        get_topology_mesh,
    )

    cfg = load_config(SMALL + parallel + [f"compile_topology={topo}"])
    mesh = get_topology_mesh(cfg, topo)
    assert mesh.devices.size == cfg.num_devices
    compiled = aot_compile_train_step(cfg, mesh)
    mem = compiled.memory_analysis()
    assert mem is not None


def test_aot_hlo_deterministic():
    """Lowering the same train step twice must produce identical HLO
    (reference: aot_hlo_identical_test.py) — catches nondeterministic
    tracing (dict ordering, fresh rng consts) that breaks compile caching."""
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.train_compile import (
        aot_compile_train_step,
        get_topology_mesh,
    )

    texts = []
    for _ in range(2):
        cfg = load_config([
            "compile_topology=v5e-8", "base_emb_dim=64", "base_mlp_dim=128",
            "base_num_decoder_layers=2", "base_num_query_heads=4",
            "base_num_kv_heads=4", "head_dim=16", "vocab_size=256",
            "max_target_length=128", "per_device_batch_size=1",
            "attention=dot_product", "scan_layers=true",
        ])
        mesh = get_topology_mesh(cfg, "v5e-8")
        lowered = aot_compile_train_step(cfg, mesh, lower_only=True)
        texts.append(lowered.as_text())
    assert texts[0] == texts[1]
