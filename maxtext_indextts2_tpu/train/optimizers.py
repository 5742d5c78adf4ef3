"""Optimizers + LR schedules (reference: MaxText/optimizers.py:26,
MaxText/maxtext_utils.py:1245 create_learning_rate_schedule)."""

from __future__ import annotations

import optax

from maxtext_indextts2_tpu.config import Config


def create_learning_rate_schedule(cfg: Config) -> optax.Schedule:
    """Linear warmup -> cosine decay to final_fraction * peak, then constant."""
    total = cfg.learning_rate_schedule_steps
    warmup = max(1, int(cfg.warmup_steps_fraction * total))
    decay = max(1, total - warmup)
    warmup_fn = optax.linear_schedule(0.0, cfg.learning_rate, warmup)
    cosine_fn = optax.cosine_decay_schedule(
        cfg.learning_rate, decay, alpha=cfg.cosine_learning_rate_final_fraction
    )
    return optax.join_schedules([warmup_fn, cosine_fn], [warmup])


def get_optimizer(cfg: Config, schedule: optax.Schedule) -> optax.GradientTransformation:
    if cfg.opt_type == "adamw":
        tx = optax.adamw(
            schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            weight_decay=cfg.adam_weight_decay,
        )
    elif cfg.opt_type == "sgd":
        tx = optax.sgd(schedule)
    else:
        raise ValueError(f"unknown opt_type: {cfg.opt_type}")

    if cfg.lora_rank > 0 and cfg.lora_only_training:
        # PEFT: update only lora_a/lora_b, hard-freeze everything else
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, _lora_labels
        )
    return tx


def _lora_labels(params):
    import jax

    return jax.tree_util.tree_map_with_path(
        lambda path, _: "train" if any("lora_" in str(k) for k in path) else "freeze",
        params,
    )
