"""AOT compilation for a target TPU topology — no hardware needed.

Reference: MaxText/train_compile.py (get_topology_mesh:63,
get_shaped_inputs:86, jit_and_compile:110) + accelerator_to_spec_map.py.
Compiles the full sharded train step for e.g. a v5e-256 on a CPU host,
validating shardings/memory and optionally serializing the executable.

CLI: ``python -m maxtext_indextts2_tpu.train.train_compile <cfg.yml>
compile_topology=v5e-256 ...``
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.train.train import batch_sharding, train_step

# name -> (topology name, chips per host, num slices attr)
TOPOLOGIES = {
    "v4-8": ("v4:2x2x1", 4),
    "v4-16": ("v4:2x2x2", 8),
    "v4-128": ("v4:4x4x4", 64),
    "v5e-8": ("v5e:2x4", 8),
    "v5e-16": ("v5e:4x4", 16),
    "v5e-64": ("v5e:8x8", 64),
    "v5e-256": ("v5e:16x16", 256),
    "v5p-8": ("v5p:2x2x1", 4),
    "v5p-128": ("v5p:4x4x4", 64),
    "v5p-256": ("v5p:4x4x8", 128),
    "v5p-512": ("v5p:4x8x8", 256),
    # trillium (reference: accelerator_to_spec_map.py v6e entries)
    "v6e-8": ("v6e:2x4", 8),
    "v6e-64": ("v6e:8x8", 64),
    "v6e-256": ("v6e:16x16", 256),
}


def get_topology_mesh(cfg: Config, topology: str, num_slices: int = 1) -> Mesh:
    """Abstract device mesh for a named topology (CPU-side, no TPUs)."""
    from jax.experimental import topologies
    
    from maxtext_indextts2_tpu.parallel.mesh import create_device_mesh

    name, num_chips = TOPOLOGIES[topology]
    topo = topologies.get_topology_desc(name)
    return create_device_mesh(cfg, topo.devices)


def aot_compile_train_step(cfg: Config, mesh: Mesh, lower_only: bool = False):
    """Lower + compile the train step against an abstract mesh. Returns the
    compiled executable (inspect .memory_analysis(), serialize, etc.), or
    the lowered-but-uncompiled object when lower_only (HLO inspection /
    determinism checks, reference aot_hlo_identical_test.py)."""
    model = Transformer(cfg=cfg, mesh=mesh)
    import flax.linen as nn

    from maxtext_indextts2_tpu.parallel import tree_logical_to_sharding
    from maxtext_indextts2_tpu.train.optimizers import (
        create_learning_rate_schedule,
        get_optimizer,
    )
    from maxtext_indextts2_tpu.train.train import TrainState, _dummy_inputs

    schedule = create_learning_rate_schedule(cfg)
    tx = get_optimizer(cfg, schedule)
    tokens, positions, segs = _dummy_inputs(cfg)

    def init_fn(rng):
        mtp_targets = tokens if cfg.mtp_num_layers > 0 else None
        variables = model.init(rng, tokens, positions, segs, targets=mtp_targets)
        return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)

    abstract = jax.eval_shape(init_fn, jax.random.PRNGKey(0))
    shardings = nn.meta.unbox(
        tree_logical_to_sharding(nn.get_partition_spec(abstract), mesh)
    )
    abstract = nn.meta.unbox(abstract)

    b, s = cfg.global_batch_size_to_train_on, cfg.max_target_length
    batch_ab = {
        k: jax.ShapeDtypeStruct((b, s), jnp.int32, sharding=batch_sharding(mesh))
        for k in ("inputs", "inputs_position", "inputs_segmentation",
                  "targets", "targets_segmentation")
    }
    state_ab = jax.tree.map(
        lambda x, sh: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh),
        abstract, shardings,
    )
    rng_ab = jax.ShapeDtypeStruct((2,), jnp.uint32)

    jitted = jax.jit(
        functools.partial(train_step, model, cfg),
        in_shardings=(shardings, batch_sharding(mesh), None),
        out_shardings=(shardings, None),
        donate_argnums=(0,),
    )
    lowered = jitted.lower(state_ab, batch_ab, rng_ab)
    if lower_only:
        return lowered
    return lowered.compile()


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    cfg = load_config(argv)
    topology = cfg.compile_topology or "v5e-8"
    mesh = get_topology_mesh(cfg, topology, cfg.compile_topology_num_slices)
    compiled = aot_compile_train_step(cfg, mesh)
    mem = compiled.memory_analysis()
    print(f"AOT compile OK for {topology}: "
          f"argument bytes={getattr(mem, 'argument_size_in_bytes', '?')}, "
          f"output bytes={getattr(mem, 'output_size_in_bytes', '?')}, "
          f"temp bytes={getattr(mem, 'temp_size_in_bytes', '?')}")
    return compiled


if __name__ == "__main__":
    main()
