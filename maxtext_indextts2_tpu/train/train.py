"""Training runtime: sharded state setup, train/eval step, train loop.

TPU-native redesign of the reference trainer (MaxText/train.py:255 loss_fn,
:352 train_step, :511 setup_train_loop, :606 train_loop). One fused XLA
program per step: jit(train_step) with explicit in/out shardings derived from
the logical-axis rules, donated state, gradient accumulation via lax.scan,
global-norm clipping.

Run: ``python -m maxtext_indextts2_tpu.train.train <config.yml> key=value ...``
"""

from __future__ import annotations

import functools
import time
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from flax.training import train_state as flax_train_state
from jax.sharding import Mesh, NamedSharding, PartitionSpec

from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.ops.losses import masked_cross_entropy
from maxtext_indextts2_tpu.parallel import (
    create_device_mesh,
    resolve,
    tree_logical_to_sharding,
)
from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
from maxtext_indextts2_tpu.train.optimizers import (
    create_learning_rate_schedule,
    get_optimizer,
)
from maxtext_indextts2_tpu.utils import flops as flops_lib
from maxtext_indextts2_tpu.utils.metrics import MetricLogger


class StopTraining(Exception):
    """Signal: target metric reached (reference: MaxText/exceptions.py)."""


class TrainState(flax_train_state.TrainState):
    pass


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, resolve(("activation_batch", "activation_length"), mesh=mesh))


def _dummy_inputs(cfg: Config):
    b, s = cfg.micro_batch_size_to_train_on, cfg.max_target_length
    tokens = jnp.zeros((b, s), jnp.int32)
    positions = jnp.zeros((b, s), jnp.int32)
    segs = jnp.zeros((b, s), jnp.int32)
    return tokens, positions, segs


def setup_train_state(
    cfg: Config, model: Transformer, mesh: Mesh, rng: jax.Array
) -> tuple[TrainState, Any]:
    """Initialize (or later: restore) the sharded train state.

    Shardings are derived by eval_shape over the boxed (logically-partitioned)
    abstract state, resolved through the rule table, then used as jit
    out_shardings so initialization happens fully sharded on-device.
    """
    schedule = create_learning_rate_schedule(cfg)
    tx = get_optimizer(cfg, schedule)
    tokens, positions, segs = _dummy_inputs(cfg)

    def init_fn(rng):
        mtp_targets = tokens if cfg.mtp_num_layers > 0 else None
        variables = model.init(rng, tokens, positions, segs, targets=mtp_targets)
        return TrainState.create(apply_fn=model.apply, params=variables["params"], tx=tx)

    abstract = jax.eval_shape(init_fn, rng)
    logical_specs = nn.get_partition_spec(abstract)
    shardings = tree_logical_to_sharding(logical_specs, mesh)
    shardings = nn.meta.unbox(shardings)
    if cfg.optimizer_memory_host_offload and jax.default_backend() != "tpu":
        # the CPU backend has no annotate_device_placement custom call —
        # downgrade gracefully so tests/drives run everywhere.
        print("optimizer_memory_host_offload: unsupported on"
              f" {jax.default_backend()}; running without offload")
    elif cfg.optimizer_memory_host_offload:
        # optimizer state lives in pinned host memory between steps; the
        # step transfers it in/out (reference: train.py:426-446 host-offload,
        # base.yml optimizer_memory_host_offload). HBM saved: 2x params
        # (adam m/v) at the cost of PCIe/host transfers per step. Scalar
        # leaves (step counts) stay on device: the SPMD partitioner rejects
        # memory-kind annotations on unsharded side-effect scalars.
        # NOTE: validated on the CPU backend only as a no-op downgrade; TPU
        # validation pending (relay outage) — treat as experimental.
        abstract_opt = nn.meta.unbox(abstract).opt_state
        shardings = shardings.replace(
            opt_state=jax.tree.map(
                lambda s, a: s.with_memory_kind("pinned_host") if a.ndim >= 1 else s,
                shardings.opt_state, abstract_opt,
            )
        )
    with mesh:
        state = jax.jit(init_fn, out_shardings=shardings)(rng)
    state = nn.meta.unbox(state)
    return state, (shardings, schedule)


def loss_fn(model: Transformer, cfg: Config, params, batch, rng, is_train: bool = True):
    fused_ce = (
        cfg.fused_vocab_ce_chunk > 0 or cfg.fused_vocab_ce_tile > 0
    ) and is_train
    out, mutables = model.apply(
        {"params": params},
        batch["inputs"],
        batch["inputs_position"],
        batch["inputs_segmentation"],
        targets=batch["targets"] if cfg.mtp_num_layers > 0 else None,
        deterministic=not (is_train and cfg.enable_dropout),
        # "params" rng: AQT's quantized dot_general draws stochastic-rounding
        # noise through it (reference passes an aqt rng the same way)
        rngs={"dropout": rng, "params": jax.random.fold_in(rng, 1)},
        mutable=["intermediates"],
        return_prelogits=fused_ce,
    )
    weights = (batch["targets_segmentation"] != 0).astype(jnp.float32)
    if fused_ce:
        # vocab projection fused into the loss: logits never materialize
        # (chunked_unembed_cross_entropy docstring; flagship 264k vocab)
        from maxtext_indextts2_tpu.ops.losses import chunked_unembed_cross_entropy

        if cfg.logits_via_embedding:
            kernel = params["token_embedder"]["embedding"].T  # [E, V]
            scale = (
                1.0 / np.sqrt(cfg.emb_dim)
                if cfg.normalize_embedding_logits else 1.0
            )
        else:
            kernel = params["logits_dense"]["kernel"]
            scale = 1.0
        ce_dt = jnp.float32 if cfg.logits_dot_in_fp32 else jnp.dtype(cfg.dtype)
        ce_ldt = cfg.fused_ce_logits_dtype or None
        if cfg.fused_ce_int8 and cfg.fused_vocab_ce_chunk > 0:
            from maxtext_indextts2_tpu.ops.losses import (
                chunked_unembed_cross_entropy_int8,
            )

            loss, total_weights = chunked_unembed_cross_entropy_int8(
                out, kernel, batch["targets"], weights,
                z_loss=cfg.z_loss_weight, chunk=cfg.fused_vocab_ce_chunk,
                soft_cap=cfg.final_logits_soft_cap, scale=scale,
                logits_dtype=ce_ldt or "bfloat16",
            )
        elif cfg.fused_vocab_ce_tile > 0:
            from maxtext_indextts2_tpu.ops.losses import (
                streaming_unembed_cross_entropy,
            )

            loss, total_weights = streaming_unembed_cross_entropy(
                out, kernel, batch["targets"], weights,
                z_loss=cfg.z_loss_weight, max_tile=cfg.fused_vocab_ce_tile,
                soft_cap=cfg.final_logits_soft_cap, scale=scale,
                compute_dtype=ce_dt,
            )
        else:
            loss, total_weights = chunked_unembed_cross_entropy(
                out, kernel, batch["targets"], weights,
                z_loss=cfg.z_loss_weight, chunk=cfg.fused_vocab_ce_chunk,
                soft_cap=cfg.final_logits_soft_cap, scale=scale,
                compute_dtype=ce_dt, logits_dtype=ce_ldt,
            )
    else:
        loss, total_weights = masked_cross_entropy(
            out, batch["targets"], weights, cfg.z_loss_weight
        )
    aux = {"ce_loss": loss, "total_weights": total_weights}
    inter = mutables.get("intermediates", {})
    lb = _collect_sown(inter, "moe_lb_loss")
    if lb is not None:
        moe_loss = jnp.mean(lb) * cfg.load_balance_loss_weight
        loss = loss + moe_loss
        aux["moe_lb_loss"] = moe_loss
    mtp = _collect_sown(inter, "mtp_loss")
    if mtp is not None:
        mtp_loss = jnp.mean(mtp) * cfg.mtp_loss_scaling_factor
        loss = loss + mtp_loss
        aux["mtp_loss"] = mtp_loss
    return loss, aux


def _collect_sown(tree, name):
    vals = []

    def visit(node):
        if isinstance(node, dict):
            for k, v in node.items():
                if k == name:
                    vals.extend(v if isinstance(v, (tuple, list)) else [v])
                else:
                    visit(v)

    visit(tree)
    if not vals:
        return None
    return jnp.stack([jnp.mean(v) for v in vals])


def train_step(model, cfg, state: TrainState, batch, rng, param_shardings=None):
    """One optimizer step (with optional in-step gradient accumulation)."""
    compute_loss = functools.partial(loss_fn, model, cfg)

    if (
        cfg.zero1_fsdp_ag_once
        and cfg.gradient_accumulation_steps > 1
        and param_shardings is not None
    ):
        # Zero-1: all-gather fsdp-sharded weights ONCE for the whole
        # accumulation scan instead of per microbatch (reference:
        # layers/models.py:173 ZeroOneTransformer). The constraint's
        # transpose reduce-scatters the summed grads back automatically.
        from jax.sharding import PartitionSpec

        def _strip_fsdp(spec):
            out = []
            for entry in spec:
                if entry is None:
                    out.append(None)
                elif isinstance(entry, (tuple, list)):
                    kept = tuple(a for a in entry if a not in ("fsdp", "fsdp_transpose"))
                    out.append(kept if kept else None)
                else:
                    out.append(None if entry in ("fsdp", "fsdp_transpose") else entry)
            return PartitionSpec(*out)

        ag_specs = jax.tree.map(
            lambda sh: _strip_fsdp(sh.spec), param_shardings,
            is_leaf=lambda x: hasattr(x, "spec"),
        )

        def compute_loss(params, mb, sub, _specs=ag_specs):  # noqa: F811
            ag = jax.tree.map(jax.lax.with_sharding_constraint, params, _specs)
            return loss_fn(model, cfg, ag, mb, sub)

    grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

    if cfg.gradient_accumulation_steps > 1:
        micro = cfg.gradient_accumulation_steps

        def to_micro(x):
            return x.reshape(micro, x.shape[0] // micro, *x.shape[1:])

        micro_batches = jax.tree.map(to_micro, batch)

        def accum(carry, mb):
            acc_grads, acc_loss, rng = carry
            rng, sub = jax.random.split(rng)
            (loss, _aux), grads = grad_fn(state.params, mb, sub)
            return (jax.tree.map(jnp.add, acc_grads, grads), acc_loss + loss, rng), None

        zero = jax.tree.map(jnp.zeros_like, state.params)
        (grads, loss_sum, _), _ = jax.lax.scan(
            accum, (zero, jnp.zeros(()), rng), micro_batches
        )
        grads = jax.tree.map(lambda g: g / micro, grads)
        loss = loss_sum / micro
        aux = {"ce_loss": loss}
    else:
        (loss, aux), grads = grad_fn(state.params, batch, rng)

    if cfg.gradient_clipping_threshold > 0:
        grads, grad_norm = _clip_by_global_norm(grads, cfg.gradient_clipping_threshold)
    else:
        grad_norm = _global_norm(grads)

    new_state = state.apply_gradients(grads=grads)
    metrics = {
        "loss": loss,
        "grad_norm": grad_norm,
        "param_norm": _global_norm(new_state.params),
        **{k: v for k, v in aux.items() if k != "total_weights"},
    }
    return new_state, metrics


def eval_step(model, cfg, state: TrainState, batch, rng):
    loss, aux = loss_fn(model, cfg, state.params, batch, rng, is_train=False)
    return {"eval_loss": loss, "eval_total_weights": aux["total_weights"]}


def _global_norm(tree) -> jax.Array:
    return jnp.sqrt(
        sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in jax.tree.leaves(tree))
    )


def _clip_by_global_norm(grads, max_norm):
    norm = _global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / jnp.maximum(norm, 1e-12))
    # cast the f32 scale per-leaf: a non-weak f32 scalar would promote bf16
    # grads (and through adam, the whole optimizer state) to f32 — measured
    # +5.2 GB on a 1.28B bf16 model AND a broken donation alias (dtype
    # mismatch state-in vs state-out => both live => OOM)
    return jax.tree.map(lambda g: g * scale.astype(g.dtype), grads), norm


def jit_train_step(model, cfg, mesh, state_shardings):
    data_shard = batch_sharding(mesh)
    step = functools.partial(
        train_step, model, cfg,
        param_shardings=getattr(state_shardings, "params", None),
    )
    # optimizer_memory_host_offload needs no in-jit transfers: the pinned
    # host in/out shardings make XLA stream the opt state in for the update
    # and back out after (scalar leaves stay on device).
    return jax.jit(
        step,
        in_shardings=(state_shardings, data_shard, NamedSharding(mesh, PartitionSpec())),
        out_shardings=(state_shardings, NamedSharding(mesh, PartitionSpec())),
        donate_argnums=(0,),
    )


def create_data_iterator(cfg: Config):
    if cfg.colocated_python_data_input:
        from maxtext_indextts2_tpu.train.data.colocated import ColocatedDataIterator

        return ColocatedDataIterator(cfg)
    if cfg.dataset_type == "synthetic":
        return SyntheticDataIterator(cfg)
    if cfg.dataset_type == "emilia_audio":
        from maxtext_indextts2_tpu.train.data.audio_iterator import (
            make_emilia_audio_train_iterator,
        )

        return make_emilia_audio_train_iterator(cfg)
    if cfg.dataset_type == "hf":
        from maxtext_indextts2_tpu.train.data.hf_pipeline import make_hf_iterator

        return make_hf_iterator(cfg)
    if cfg.dataset_type == "grain":
        from maxtext_indextts2_tpu.train.data.grain_pipeline import make_grain_iterator

        return make_grain_iterator(cfg)
    if cfg.dataset_type == "tfds":
        from maxtext_indextts2_tpu.train.data.tfds_pipeline import make_tfds_iterator

        return make_tfds_iterator(cfg)
    if cfg.dataset_type == "c4_mlperf":
        from maxtext_indextts2_tpu.train.data.mlperf_pipeline import (
            make_c4_mlperf_iterator,
        )

        return make_c4_mlperf_iterator(cfg)
    raise ValueError(f"unknown dataset_type: {cfg.dataset_type}")


def setup_train_loop(cfg: Config, mesh: Mesh | None = None):
    if mesh is None:
        mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    rng = jax.random.PRNGKey(cfg.init_weights_seed)
    state, (state_shardings, schedule) = setup_train_state(cfg, model, mesh, rng)
    data_iter = create_data_iterator(cfg)
    return model, mesh, state, state_shardings, schedule, data_iter


def train_loop(cfg: Config, mesh: Mesh | None = None) -> dict:
    """Returns final metrics. Reference: MaxText/train.py:606."""
    model, mesh, state, state_shardings, schedule, data_iter = setup_train_loop(cfg, mesh)
    p_train_step = jit_train_step(model, cfg, mesh, state_shardings)
    data_shard = batch_sharding(mesh)

    if cfg.dump_hlo:
        _dump_hlo(cfg, model, mesh, state, state_shardings)

    logger = MetricLogger(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    step_tflops = flops_lib.training_tflops_per_step(cfg)

    if cfg.collect_stack_trace:
        from maxtext_indextts2_tpu.utils.debug import enable_hang_diagnostics

        enable_hang_diagnostics(cfg.stack_trace_interval_seconds)

    # Context parallelism: apply the load-balanced causal reorder to every
    # sequence-shaped field so each context shard does equal work
    # (reference: MaxText/train.py:548-552 + max_utils.py:788).
    cp = cfg.ici_context_parallelism * cfg.dcn_context_parallelism
    reorder = None
    if cp > 1 and cfg.context_parallel_load_balance and cfg.attention != "dot_product":
        from maxtext_indextts2_tpu.ops.flash_attention import load_balanced_reorder

        reorder = jax.jit(
            functools.partial(
                jax.tree.map, lambda x: load_balanced_reorder(x, cp, axis=1)
            )
        )

    checkpointer = None
    save_period = cfg.checkpoint_period
    if cfg.enable_checkpointing:
        if cfg.enable_emergency_checkpoint:
            from maxtext_indextts2_tpu.train.checkpointing import (
                EmergencyCheckpointManager,
            )

            checkpointer = EmergencyCheckpointManager(cfg)
            # the manager routes each save to the tier(s) due at that step;
            # the loop only needs the faster cadence
            save_period = checkpointer.local_period
        else:
            from maxtext_indextts2_tpu.train.checkpointing import CheckpointManager

            checkpointer = CheckpointManager(cfg)
        restored = checkpointer.maybe_restore(state)
        if restored is not None:
            state = restored

    metrics = {}
    start_step = int(state.step)
    last_time = time.perf_counter()
    with mesh:
        for step in range(start_step, cfg.steps):
            batch = next(data_iter)
            batch = jax.tree.map(
                lambda x: _put_batch(x, data_shard, cfg.global_batch_size_to_train_on), batch
            )
            if reorder is not None:
                batch = reorder(batch)
            rng, step_rng = jax.random.split(rng)
            state, metrics = p_train_step(state, batch, step_rng)

            now = time.perf_counter()
            step_time = now - last_time
            last_time = now
            logger.write_step(
                step,
                metrics,
                step_time=step_time,
                tflops_per_step=step_tflops,
                tokens_per_step=cfg.global_batch_size_to_train_on * cfg.max_target_length,
            )

            if checkpointer is not None and (
                (step + 1) % save_period == 0
                or (cfg.save_final_checkpoint and step == cfg.steps - 1)
            ):
                # force on the final step so the emergency manager writes the
                # durable tier even off its persistent cadence
                checkpointer.save(
                    step, state,
                    force=cfg.save_final_checkpoint and step == cfg.steps - 1,
                )

            # periodic eval + early stop (reference: train.py:673-692)
            if cfg.eval_interval > 0 and (step + 1) % cfg.eval_interval == 0:
                eval_metrics = run_eval(cfg, model, state, mesh, p_eval=None)
                logger.write_step(step, eval_metrics, step_time=0.0)
                target = cfg.target_eval_loss
                if target > 0 and float(eval_metrics["eval_loss"]) <= target:
                    print(f"target_eval_loss {target} reached at step {step}; stopping")
                    break

    if checkpointer is not None:
        checkpointer.close()
    logger.close()
    return jax.tree.map(lambda x: np.asarray(x), metrics)


def _dump_hlo(cfg: Config, model, mesh, state, state_shardings) -> str:
    """Write the lowered train-step HLO to hlo_dump_dir (reference:
    train.py:663-671 HLO dump + gcs_utils upload; here local-dir only —
    point hlo_dump_dir at a mounted bucket for the same effect)."""
    import os

    out_dir = cfg.hlo_dump_dir or os.path.join(
        cfg.base_output_directory or "/tmp", cfg.run_name, "hlo"
    )
    os.makedirs(out_dir, exist_ok=True)
    batch = next(SyntheticDataIterator(cfg, cfg.global_batch_size_to_train_on))
    abstract_batch = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), batch
    )
    abstract_state = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), state
    )
    with mesh:
        lowered = jax.jit(
            functools.partial(train_step, model, cfg),
        ).lower(abstract_state, abstract_batch, jax.ShapeDtypeStruct((2,), jnp.uint32))
    path = os.path.join(out_dir, "train_step.hlo.txt")
    with open(path, "w") as f:
        f.write(lowered.as_text())
    print(f"HLO dumped to {path}")
    return path


def run_eval(cfg: Config, model, state, mesh, p_eval=None, num_batches: int | None = None):
    """Average eval loss over eval_steps batches of held-out (or synthetic) data."""
    n = num_batches or (cfg.eval_steps if cfg.eval_steps > 0 else 4)
    eval_iter = SyntheticDataIterator(cfg, cfg.global_batch_size_to_eval_on)
    if cfg.dataset_type == "emilia_audio":
        from maxtext_indextts2_tpu.train.data.audio_iterator import (
            make_emilia_audio_eval_iterator,
        )

        eval_iter = make_emilia_audio_eval_iterator(cfg)
    p_step = p_eval or jax.jit(functools.partial(eval_step, model, cfg))
    total, weight = 0.0, 0.0
    rng = jax.random.PRNGKey(cfg.seed + 777)
    dshard = batch_sharding(mesh)
    with mesh:
        for _ in range(n):
            batch = jax.tree.map(
                lambda x: _put_batch(x, dshard, cfg.global_batch_size_to_eval_on),
                next(eval_iter),
            )
            m = p_step(state, batch, rng)
            total += float(m["eval_loss"]) * float(m["eval_total_weights"])
            weight += float(m["eval_total_weights"])
    return {"eval_loss": total / max(weight, 1e-9), "eval_weight": weight}


def _put_batch(x, sharding, train_batch):
    x = jnp.asarray(x)
    if x.shape[0] != train_batch:  # drop the load/train remainder
        x = x[:train_batch]
    return jax.device_put(x, sharding)


def main(argv=None):
    import sys

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    from maxtext_indextts2_tpu.parallel import (
        maybe_initialize_distributed,
        maybe_initialize_single_controller,
    )

    maybe_initialize_single_controller(cfg)
    maybe_initialize_distributed(cfg)
    metrics = train_loop(cfg)
    print({k: float(v) for k, v in metrics.items()})


if __name__ == "__main__":
    main()
