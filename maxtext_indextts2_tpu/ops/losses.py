"""Loss ops.

Cross-entropy with z-loss as a custom-VJP op (reference:
MaxText/max_utils.py:565-656 cross_entropy_with_logits). Unlike the
reference's one-hot formulation, the forward gathers the target logit
directly (no [B,S,V] one-hot materialization) and the backward rebuilds the
softmax and applies a scatter-subtract — saving HBM at 264k-row audio vocabs.

z-loss (ST-MoE, arXiv:2202.08906) regularizes log Z toward 0, keeping logits
from drifting and stabilizing bf16 training.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def cross_entropy_with_logits(logits: jax.Array, targets: jax.Array, z_loss: float):
    """Per-token CE + z-loss.

    Args:
      logits: [..., V] float.
      targets: [...] int token ids.
      z_loss: scalar coefficient for log(Z)^2 regularization.

    Returns:
      (total_loss, ce_loss): each [...] float32.
    """
    total, ce, _ = _ce_fwd_impl(logits, targets, z_loss)
    return total, ce


def _ce_fwd_impl(logits, targets, z_loss):
    logits = logits.astype(jnp.float32)
    max_logit = jax.lax.stop_gradient(jnp.max(logits, axis=-1, keepdims=True))
    shifted = logits - max_logit
    sum_exp = jnp.sum(jnp.exp(shifted), axis=-1)
    log_z = jnp.log(sum_exp) + jnp.squeeze(max_logit, -1)
    target_logit = jnp.take_along_axis(
        logits, targets[..., None].astype(jnp.int32), axis=-1
    )[..., 0]
    ce = log_z - target_logit
    total = ce + z_loss * jnp.square(log_z)
    return total, ce, (shifted, sum_exp, log_z, targets)


def _ce_fwd(logits, targets, z_loss):
    total, ce, res = _ce_fwd_impl(logits, targets, z_loss)
    return (total, ce), (res, z_loss)


def _ce_bwd(saved, g):
    (shifted, sum_exp, log_z, targets), z_loss = saved
    g_total, g_ce = g
    # d total / d logits = softmax - onehot(target) + 2*z_loss*log_z*softmax
    softmax = jnp.exp(shifted) / sum_exp[..., None]
    coeff = (g_total + g_ce)[..., None]
    dlogits = coeff * softmax
    dlogits += (g_total * 2.0 * z_loss * log_z)[..., None] * softmax
    # scatter-subtract the one-hot term
    onehot_grad = (g_total + g_ce)[..., None]
    dlogits = _scatter_sub(dlogits, targets, onehot_grad[..., 0])
    return dlogits, None, None


def _scatter_sub(x, idx, val):
    flat = x.reshape(-1, x.shape[-1])
    fidx = idx.reshape(-1).astype(jnp.int32)
    fval = val.reshape(-1)
    rows = jnp.arange(flat.shape[0])
    flat = flat.at[rows, fidx].add(-fval)
    return flat.reshape(x.shape)


cross_entropy_with_logits.defvjp(_ce_fwd, _ce_bwd)


def masked_cross_entropy(
    logits: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    z_loss: float = 0.0,
) -> tuple[jax.Array, jax.Array]:
    """Weighted mean CE over valid tokens.

    Returns (mean_loss, total_weight). ``weights`` is typically the segment
    mask (1 for real tokens, 0 for padding).
    """
    total, _ = cross_entropy_with_logits(logits, targets, z_loss)
    total = total * weights
    denom = jnp.maximum(jnp.sum(weights), 1e-6)
    return jnp.sum(total) / denom, denom
