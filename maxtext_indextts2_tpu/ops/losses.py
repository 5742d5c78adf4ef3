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


def chunked_unembed_cross_entropy(
    y: jax.Array,
    kernel: jax.Array,
    targets: jax.Array,
    weights: jax.Array,
    z_loss: float = 0.0,
    chunk: int = 512,
    soft_cap: float = 0.0,
    scale: float = 1.0,
    compute_dtype=None,
) -> tuple[jax.Array, jax.Array]:
    """Vocab projection fused INTO the loss: the [B,S,V] logits never
    materialize.

    At the flagship's 264,192-row vocab, full logits are the training step's
    dominant HBM object (batch 4 x seq 2048 x 264k = 8.6 GB in f32, held
    through the backward). Here the flattened [B*S] rows are processed in
    ``chunk``-row slices: each slice's logits [chunk, V] are produced,
    reduced to a loss partial, and discarded; ``jax.checkpoint`` recomputes
    them in the backward, so peak logits memory is one chunk in each
    direction. dW accumulates across the lax.scan (kernel is a scan
    constant). Reference regime: MaxText vocab_expansion/expand_embedder.py
    + maxtext_utils CE — the reference materializes full logits.

    Args:
      y: [B, S, E] final-normed hidden states (Transformer.prelogits output).
      kernel: [E, V] unembedding matrix (logits_dense kernel, or the tied
        embedding transposed).
      targets: [B, S] int ids; weights: [B, S] (0 masks a token).
      soft_cap / scale: final_logits_soft_cap and the tied-embedding
        1/sqrt(E) normalizer — applied exactly as Transformer._unembed does.
      compute_dtype: matmul dtype (cfg.dtype, or f32 when logits_dot_in_fp32).

    Returns (mean_loss, total_weight) — identical contract (and values, see
    tests/test_train.py parity test) to unfused masked_cross_entropy over
    Transformer's logits.
    """
    b, s, e = y.shape
    n = b * s
    yf = y.reshape(n, e)
    tf = targets.reshape(n).astype(jnp.int32)
    wf = weights.reshape(n).astype(jnp.float32)
    pad = (-n) % chunk
    if pad:
        yf = jnp.pad(yf, ((0, pad), (0, 0)))
        tf = jnp.pad(tf, (0, pad))
        wf = jnp.pad(wf, (0, pad))  # padded rows carry weight 0
    yc = yf.reshape(-1, chunk, e)
    tc = tf.reshape(-1, chunk)
    wc = wf.reshape(-1, chunk)
    dt = compute_dtype or y.dtype

    @jax.checkpoint
    def chunk_loss_sum(y_c, t_c, w_c, kern):
        logits = jnp.dot(
            y_c.astype(dt), kern.astype(dt), preferred_element_type=jnp.float32
        )
        if scale != 1.0:
            logits = logits * scale
        if soft_cap > 0.0:
            logits = soft_cap * jnp.tanh(logits / soft_cap)
        total, _ = cross_entropy_with_logits(logits, t_c, z_loss)
        return jnp.sum(total * w_c)

    def body(acc, xs):
        y_c, t_c, w_c = xs
        return acc + chunk_loss_sum(y_c, t_c, w_c, kernel), None

    loss_sum, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), (yc, tc, wc))
    denom = jnp.maximum(jnp.sum(wf), 1e-6)
    return loss_sum / denom, denom


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
