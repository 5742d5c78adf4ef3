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

# Topology resolution covers the reference's full accelerator map breadth
# (reference: MaxText/accelerator_to_spec_map.py:28-174) without a hand-kept
# table: any "<gen>-<cores>" name resolves to a valid ICI torus.
# v4/v5p are 3D tori with 2 cores/chip ("megacore"); v5e/v6e are 2D with
# 1 core/chip (max 16x16 per slice).
_CORES_PER_CHIP = {"v4": 2, "v5p": 2, "v5e": 1, "v6e": 1}
_PLATFORM_PREFIX = {"v4": "v4", "v5p": "v5", "v5e": "v5e", "v6e": "v6e"}
_SMALL_3D = {1: (1, 1, 1), 2: (1, 1, 2), 4: (2, 2, 1), 8: (2, 2, 2),
             16: (2, 2, 4), 32: (2, 4, 4)}


def _torus_3d(chips: int) -> tuple[int, int, int]:
    """Balanced 3D torus factorization, every dim a multiple of 4 above the
    small special cases (matches real v4/v5p deployments: 4x4x4, 4x4x8,
    4x8x8, 8x8x8, 8x16x16, 16x16x24, ...)."""
    if chips in _SMALL_3D:
        return _SMALL_3D[chips]
    best = None
    a = 4
    while a * a * a <= chips:
        if chips % a == 0:
            rest = chips // a
            b = a
            while b * b <= rest:
                if rest % b == 0:
                    c = rest // b
                    if c % 4 == 0 and (best is None or c - a < best[2] - best[0]):
                        best = (a, b, c)
                b += 4
        a += 4
    if best is None:
        raise ValueError(f"no valid 3D torus for {chips} chips")
    return best


def _torus_2d(chips: int) -> tuple[int, int]:
    """2D v5e/v6e slice shape: powers of two up to 16x16 (256 chips)."""
    if chips > 256:
        raise ValueError(
            f"v5e/v6e slices max out at 256 chips ({chips} requested); "
            "use compile_topology_num_slices for multi-slice targets"
        )
    x = 1
    while x * x < chips:
        x *= 2
    y = chips // x
    if x * y != chips:
        raise ValueError(f"no valid 2D slice shape for {chips} chips")
    return (y, x)


def resolve_topology(name: str) -> tuple[str, int]:
    """"v5p-512" -> ("v5:4x8x8", 256 chips)."""
    gen, _, cores_s = name.partition("-")
    if gen not in _CORES_PER_CHIP or not cores_s.isdigit():
        raise ValueError(f"unknown topology {name!r} (want e.g. v5e-256, v5p-512)")
    chips = int(cores_s) // _CORES_PER_CHIP[gen]
    dims = _torus_3d(chips) if gen in ("v4", "v5p") else _torus_2d(chips)
    shape = "x".join(str(d) for d in dims)
    return f"{_PLATFORM_PREFIX[gen]}:{shape}", chips


def get_topology_mesh(cfg: Config, topology: str, num_slices: int = 1) -> Mesh:
    """Abstract device mesh for a named topology (CPU-side, no TPUs).
    num_slices > 1 produces a DCN-connected multi-slice device set
    (reference: train_compile.py get_topology_desc(num_slices=...))."""
    from jax.experimental import topologies

    from maxtext_indextts2_tpu.parallel.mesh import create_device_mesh

    name, num_chips = resolve_topology(topology)
    kwargs = {"num_slices": num_slices} if num_slices > 1 else {}
    topo = topologies.get_topology_desc(name, **kwargs)
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
