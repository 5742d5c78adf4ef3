"""Logical-axis sharding rules.

The single source of truth for how every logical tensor dimension maps onto
mesh axes — the TPU-native replacement for the reference's 70-line fallback
rule table (reference: MaxText/configs/base.yml:319-388).

Unlike flax's resolver (which drops a whole rule if *any* of its mesh axes is
already taken, forcing long fallback chains), :func:`resolve` assigns greedily
per mesh axis: each dimension takes every axis from its rule that an earlier
dimension hasn't consumed. One rule per logical name suffices.

Weights carry logical axis names via ``nn.with_logical_partitioning``
(metadata only); activations are constrained with :func:`shard` under an
ambient mesh. XLA GSPMD inserts all collectives (psum / all-gather /
reduce-scatter / ppermute) from these annotations — there is no hand-written
communication backend, matching the reference design (SURVEY.md §2.5).
"""

from __future__ import annotations

import jax
from flax import linen as nn
from jax.sharding import Mesh, NamedSharding, PartitionSpec

# Logical axis name -> ordered mesh axes it may shard over.
LOGICAL_AXIS_RULES: dict[str, tuple[str, ...]] = {
    # activations
    "activation_batch": ("data", "fsdp", "fsdp_transpose", "expert"),
    "activation_batch_no_exp": ("data", "fsdp", "fsdp_transpose"),
    "activation_embed_and_logits_batch": ("data", "stage", "fsdp", "fsdp_transpose", "expert"),
    "activation_heads": ("tensor", "tensor_transpose", "sequence", "tensor_sequence"),
    "activation_kv_heads": ("tensor", "tensor_transpose", "sequence", "tensor_sequence"),
    "activation_length": ("sequence", "context"),
    "activation_norm_length": ("tensor_sequence", "sequence", "context"),
    "activation_q_length": ("context",),
    "activation_kv_length": (),
    "activation_embed": ("tensor", "tensor_transpose"),
    "activation_mlp": ("tensor", "tensor_transpose", "tensor_sequence"),
    "activation_kv": ("tensor", "tensor_transpose", "tensor_sequence"),
    "activation_kv_batch": ("data", "fsdp", "fsdp_transpose", "expert"),
    "activation_kv_head_dim": ("tensor", "tensor_transpose", "tensor_sequence"),
    "activation_vocab": ("tensor", "tensor_transpose", "sequence", "tensor_sequence"),
    "activation_stage": ("stage",),
    "activation_exp": ("expert",),
    "decode_batch": ("data", "fsdp", "fsdp_transpose", "expert"),
    "decode_length": (),
    # weights
    "embed": ("fsdp", "fsdp_transpose", "sequence", "tensor_transpose", "context", "expert"),
    "embed_no_exp": ("fsdp", "fsdp_transpose", "sequence", "tensor_transpose", "context"),
    "q_lora": ("fsdp", "fsdp_transpose", "sequence", "context", "expert"),
    "kv_lora": ("fsdp", "fsdp_transpose", "sequence", "context", "expert"),
    "norm": ("tensor", "tensor_transpose", "tensor_sequence"),
    "heads": ("tensor", "tensor_transpose", "tensor_sequence", "autoregressive"),
    "q_heads": ("tensor", "tensor_transpose", "tensor_sequence", "autoregressive"),
    "kv_heads": ("tensor", "tensor_transpose", "tensor_sequence", "autoregressive"),
    "kv_head_dim": (),
    "vocab": ("tensor", "tensor_transpose", "tensor_sequence", "autoregressive"),
    "mlp": ("tensor", "tensor_sequence", "fsdp_transpose", "autoregressive"),
    "exp": ("expert",),
    "layers": ("stage",),
    "mtp": (),
    # kv-cache (inference)
    "cache_batch_prefill": (),
    "cache_batch": ("data", "fsdp", "fsdp_transpose", "expert"),
    "cache_heads": ("tensor", "tensor_transpose", "tensor_sequence", "autoregressive"),
    "cache_kv": (),
    "cache_sequence": ("context_autoregressive",),
    "cache_scale_batch": ("data", "fsdp", "fsdp_transpose", "expert"),
    "cache_scale_heads": ("tensor", "tensor_transpose", "tensor_sequence", "autoregressive"),
    "cache_scale_kv": (),
    "cache_scale_sequence": (),
    "paged_kv_pages": (),
    "paged_kv_heads": ("tensor", "tensor_transpose", "autoregressive"),
    # audio stack
    "audio_channels": ("tensor",),
    "audio_time": (),
    "codebook": (),
    "codebook_dim": (),
}


def resolve(
    names: tuple[str | None, ...] | PartitionSpec,
    rules: dict[str, tuple[str, ...]] | None = None,
    mesh: Mesh | None = None,
) -> PartitionSpec:
    """Resolve logical dim names to a PartitionSpec, greedily per mesh axis.

    If ``mesh`` is given, axes of size 1 are dropped from the result (they
    shard nothing and keeping them off the spec keeps XLA layouts cleaner).
    """
    rules = rules if rules is not None else LOGICAL_AXIS_RULES
    used: set[str] = set()
    out = []
    for name in names:
        if name is None:
            out.append(None)
            continue
        if name not in rules:
            raise ValueError(f"unknown logical axis name: {name!r}")
        take = [ax for ax in rules[name] if ax not in used]
        if mesh is not None:
            take = [ax for ax in take if mesh.shape.get(ax, 1) > 1]
        used.update(take)
        if not take:
            out.append(None)
        elif len(take) == 1:
            out.append(take[0])
        else:
            out.append(tuple(take))
    return PartitionSpec(*out)


def shard(x, *names: str | None, rules=None):
    """Constrain an activation's sharding by logical dim names.

    Must run under an ambient mesh (``with mesh:`` around the jitted call).
    No-op outside jit/mesh contexts so pure-CPU unit code keeps working.
    """
    spec = resolve(tuple(names), rules)
    try:
        return jax.lax.with_sharding_constraint(x, spec)
    except (ValueError, RuntimeError):
        return x


def logical_to_mesh_axes(names: tuple[str | None, ...], rules=None) -> PartitionSpec:
    return resolve(names, rules)


def logical_to_sharding(names: tuple[str | None, ...], mesh: Mesh, rules=None) -> NamedSharding:
    return NamedSharding(mesh, resolve(names, rules, mesh=mesh))


def with_logical_partitioning(init_fn, names: tuple[str | None, ...]):
    """Attach logical axis names to a param initializer (flax metadata box)."""
    return nn.with_logical_partitioning(init_fn, names)


def tree_logical_to_sharding(logical_tree, mesh: Mesh, rules=None):
    """Map a pytree of logical-name PartitionSpecs (from nn.get_partition_spec)
    to NamedShardings using our resolver."""
    def _one(spec):
        if spec is None or not isinstance(spec, PartitionSpec):
            return NamedSharding(mesh, PartitionSpec())
        return NamedSharding(mesh, resolve(tuple(spec), rules, mesh=mesh))

    return jax.tree.map(
        _one, logical_tree, is_leaf=lambda s: isinstance(s, PartitionSpec) or s is None
    )


def assert_params_sufficiently_sharded(params, mesh: Mesh, tolerance: float = 0.02) -> float:
    """Fraction of parameter bytes left fully replicated must be < tolerance.

    Reference: MaxText/maxtext_utils.py:791 assert_params_sufficiently_sharded.
    Returns the unsharded fraction.
    """
    shard_axes = {"fsdp", "fsdp_transpose", "sequence", "context", "tensor",
                  "tensor_transpose", "tensor_sequence", "stage", "expert",
                  "autoregressive"}
    active = {ax for ax in shard_axes if mesh.shape.get(ax, 1) > 1}
    if not active:
        return 0.0

    total = 0
    unsharded = 0
    for leaf in jax.tree.leaves(params):
        nbytes = leaf.size * leaf.dtype.itemsize
        total += nbytes
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        used = set()
        if spec is not None:
            for entry in spec:
                if entry is None:
                    continue
                if isinstance(entry, (tuple, list)):
                    used.update(entry)
                else:
                    used.add(entry)
        if not (used & active):
            unsharded += nbytes
    frac = unsharded / max(total, 1)
    if frac > tolerance:
        raise AssertionError(
            f"{frac:.1%} of parameter bytes are fully replicated over active mesh axes "
            f"{sorted(active)} (tolerance {tolerance:.1%})"
        )
    return frac
