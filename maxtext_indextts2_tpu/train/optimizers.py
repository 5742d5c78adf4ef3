"""Optimizers + LR schedules (reference: MaxText/optimizers.py:26,
MaxText/maxtext_utils.py:1245 create_learning_rate_schedule)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from maxtext_indextts2_tpu.config import Config


def adam_pax(
    schedule: optax.Schedule,
    b1: float,
    b2: float,
    eps: float,
    eps_root: float,
    weight_decay: float,
) -> optax.GradientTransformation:
    """Praxis/Pax-style sharded Adam (reference: MaxText/optimizers.py:54).

    Differences from optax.adamw that change the numerics:
    - bias correction is folded INTO the moment decay rates
      (beta_t = beta * (1 - beta^(t-1)) / (1 - beta^t), arXiv:1804.04235 §7.1)
      instead of rescaling the moments afterwards;
    - ``eps_root`` sits inside the square root: update = m / (sqrt(v+eps_root)+eps);
    - weight decay is added to the PRE-learning-rate update (not decoupled).
    """

    def corrected(beta, t):
        # t is 1-based f32; at t=1 this is exactly 0 (moments become the grad)
        return beta * (1.0 - jnp.power(beta, t - 1.0)) / (1.0 - jnp.power(beta, t))

    def init(params):
        zeros = lambda p: jax.tree.map(jnp.zeros_like, p)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32), mu=zeros(params), nu=zeros(params)
        )

    def update(grads, state, params=None):
        if weight_decay > 0:
            assert params is not None, "adam_pax weight decay needs params"
        t = state.count.astype(jnp.float32) + 1.0

        def moments(g, mu, nu):
            # decay computed in f32 THEN cast: beta^t in bf16 rounds to 1
            c1 = corrected(b1, t).astype(g.dtype)
            c2 = corrected(b2, t).astype(g.dtype)
            return (
                (1.0 - c1) * g + c1 * mu,
                (1.0 - c2) * jnp.square(g) + c2 * nu,
            )

        new = jax.tree.map(moments, grads, state.mu, state.nu)
        mu = jax.tree.map(lambda x: x[0], new, is_leaf=lambda x: isinstance(x, tuple))
        nu = jax.tree.map(lambda x: x[1], new, is_leaf=lambda x: isinstance(x, tuple))
        upd = jax.tree.map(
            lambda m, v: m / (jnp.sqrt(v + eps_root) + eps), mu, nu
        )
        if weight_decay > 0:
            upd = jax.tree.map(lambda u, p: u + weight_decay * p, upd, params)
        step = -1.0 * schedule(state.count)
        upd = jax.tree.map(lambda u: step * u, upd)
        return upd, optax.ScaleByAdamState(count=state.count + 1, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


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
    elif cfg.opt_type == "adam_pax":
        tx = adam_pax(
            schedule,
            b1=cfg.adam_b1,
            b2=cfg.adam_b2,
            eps=cfg.adam_eps,
            eps_root=cfg.adam_eps_root,
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
