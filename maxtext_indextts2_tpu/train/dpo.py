"""Direct Preference Optimization.

Reference: MaxText/train.py:140 dpo_loss_fn (+ grain DPO pipeline). Batch
carries chosen/rejected token rows; the loss is

    -log sigmoid(beta * ((pi_c - ref_c) - (pi_r - ref_r)))

with per-sequence summed log-probs over completion tokens. Reference params
are a frozen copy carried alongside the train state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.sampling import log_probs_from_logits


def _seq_logprob(model, params, tokens, positions, segs, targets, weights):
    logits = model.apply({"params": params}, tokens, positions, segs)
    lp = log_probs_from_logits(logits, targets)
    return jnp.sum(lp * weights, axis=-1)  # [B]


def dpo_loss_fn(model, cfg: Config, params, ref_params, batch, beta: float = 0.1):
    """batch keys: {chosen,rejected}_{inputs,targets,position,segmentation}."""
    def lp(p, side):
        w = (batch[f"{side}_targets_segmentation"] != 0).astype(jnp.float32)
        return _seq_logprob(
            model, p,
            batch[f"{side}_inputs"], batch[f"{side}_position"],
            batch[f"{side}_segmentation"], batch[f"{side}_targets"], w,
        )

    pi_c, pi_r = lp(params, "chosen"), lp(params, "rejected")
    ref_c = jax.lax.stop_gradient(lp(ref_params, "chosen"))
    ref_r = jax.lax.stop_gradient(lp(ref_params, "rejected"))

    logits = beta * ((pi_c - ref_c) - (pi_r - ref_r))
    loss = -jnp.mean(jax.nn.log_sigmoid(logits))
    aux = {
        "dpo_accuracy": jnp.mean((pi_c - ref_c > pi_r - ref_r).astype(jnp.float32)),
        "chosen_reward": jnp.mean(beta * (pi_c - ref_c)),
        "rejected_reward": jnp.mean(beta * (pi_r - ref_r)),
    }
    return loss, aux


def dpo_train_step(model, cfg: Config, state, ref_params, batch, rng, beta: float = 0.1):
    grad_fn = jax.value_and_grad(
        functools.partial(dpo_loss_fn, model, cfg), has_aux=True
    )
    (loss, aux), grads = grad_fn(state.params, ref_params, batch, beta)
    new_state = state.apply_gradients(grads=grads)
    return new_state, {"loss": loss, **aux}
