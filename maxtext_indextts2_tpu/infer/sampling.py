"""Token sampling: greedy / weighted (temperature) / top-k / nucleus.

Reference: MaxText/inference_utils.py:66-120. All jit-safe, vectorized over
the batch dimension.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1.0e9


def sample_tokens(
    logits: jax.Array,  # [B, V] float
    rng: jax.Array,
    strategy: str = "greedy",
    temperature: float = 1.0,
    top_k: int = 40,
    nucleus_p: float = 0.95,
) -> jax.Array:
    """Returns [B] int32 sampled token ids."""
    if strategy == "greedy":
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if strategy == "weighted":
        return jax.random.categorical(rng, logits / temperature, axis=-1).astype(jnp.int32)
    if strategy == "topk":
        vals, idx = jax.lax.top_k(logits, top_k)
        draw = jax.random.categorical(rng, vals / temperature, axis=-1)
        return jnp.take_along_axis(idx, draw[:, None], axis=-1)[:, 0].astype(jnp.int32)
    if strategy == "nucleus":
        sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
        probs = jax.nn.softmax(sorted_logits / temperature, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        cutoff_mask = cum - probs > nucleus_p  # keep tokens until mass >= p
        cutoff = jnp.where(cutoff_mask, NEG_INF, sorted_logits)
        threshold = jnp.min(
            jnp.where(cutoff_mask, jnp.inf, sorted_logits), axis=-1, keepdims=True
        )
        masked = jnp.where(logits < threshold, NEG_INF, logits)
        return jax.random.categorical(rng, masked / temperature, axis=-1).astype(jnp.int32)
    raise ValueError(f"unknown sampling strategy: {strategy}")


def log_probs_from_logits(logits: jax.Array, tokens: jax.Array) -> jax.Array:
    """[..., V], [...] -> [...] log p(token)."""
    logz = jax.nn.logsumexp(logits, axis=-1)
    tl = jnp.take_along_axis(logits, tokens[..., None], axis=-1)[..., 0]
    return tl - logz
