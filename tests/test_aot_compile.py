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


def test_resolve_topology_breadth():
    """Any <gen>-<cores> name resolves to a valid torus (reference map
    breadth: accelerator_to_spec_map.py:28-174 incl. v5p-12288-class)."""
    from maxtext_indextts2_tpu.train.train_compile import resolve_topology

    cases = {
        "v4-8": ("v4:2x2x1", 4),
        "v4-128": ("v4:4x4x4", 64),
        "v5p-8": ("v5:2x2x1", 4),
        "v5p-128": ("v5:4x4x4", 64),
        "v5p-512": ("v5:4x8x8", 256),
        "v5p-1024": ("v5:8x8x8", 512),
        "v5p-4096": ("v5:8x16x16", 2048),
        "v5p-8192": ("v5:16x16x16", 4096),
        "v5p-12288": ("v5:16x16x24", 6144),
        "v5e-8": ("v5e:2x4", 8),
        "v5e-256": ("v5e:16x16", 256),
        "v6e-256": ("v6e:16x16", 256),
    }
    for name, (want_shape, want_chips) in cases.items():
        shape, chips = resolve_topology(name)
        assert chips == want_chips, (name, shape, chips)
        # dims may be permuted vs the canonical listing; compare the product
        # and dim multiset
        got = sorted(int(d) for d in shape.split(":")[1].split("x"))
        want = sorted(int(d) for d in want_shape.split(":")[1].split("x"))
        assert got == want and shape.startswith(want_shape.split(":")[0] + ":"), (
            name, shape, want_shape,
        )

    import pytest

    with pytest.raises(ValueError):
        resolve_topology("v7x-8")
    with pytest.raises(ValueError):
        resolve_topology("v5e-512")  # beyond one slice
