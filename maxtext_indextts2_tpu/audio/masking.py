"""Masking utilities for masked-generative audio training.

Counterpart of reference maskgct/s2a/masking_utils.py:9-171 (layer
schedules, random/causal/padding/structured-span masks, masked CE). All
functions are jit-compatible: the structured span mask is built with
vectorized start/length sampling and broadcast comparisons instead of the
reference's per-batch python while-loop (same distribution family, no
data-dependent control flow).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def get_mask_layer_schedule(schedule_type: str = "linear", num_layers: int = 12):
    """Per-layer schedule values in [0, 1] (reference masking_utils.py:9)."""
    if num_layers < 2:
        # the schedules interpolate over (num_layers - 1) steps; a single
        # layer would divide by zero (NaN) — there is nothing to schedule
        return [0.0] * num_layers
    i = np.arange(num_layers, dtype=np.float64)
    if schedule_type == "linear":
        vals = np.linspace(0.0, 1.0, num_layers)
    elif schedule_type == "cosine":
        vals = 0.5 * (1 + np.cos(np.pi * i / (num_layers - 1)))
    elif schedule_type == "arccos":
        vals = np.arccos(1 - 2 * i / (num_layers - 1)) / np.pi
    else:
        raise ValueError(f"Unknown schedule type: {schedule_type}")
    return vals.astype(np.float32).tolist()


def get_layer_mask_prob(layer_idx: int, schedule, base_prob: float = 0.3) -> float:
    """base + (1-base) * schedule[layer] (reference masking_utils.py:124)."""
    if layer_idx >= len(schedule):
        return base_prob
    return base_prob + (1 - base_prob) * schedule[layer_idx]


def create_random_mask(rng: jax.Array, shape, mask_prob) -> jax.Array:
    """Bernoulli(mask_prob) boolean mask."""
    return jax.random.uniform(rng, shape) < mask_prob


def create_causal_mask(seq_len: int) -> jax.Array:
    """[S, S] bool, True ABOVE the diagonal (positions to mask out) —
    the reference's triu(…, 1) convention."""
    r = jnp.arange(seq_len)
    return r[None, :] > r[:, None]


def create_padding_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """[B, S] bool, True at PAD positions (reference convention)."""
    return jnp.arange(max_len)[None, :] >= lengths[:, None]


def apply_mask_to_sequence(sequence, mask, mask_token_id):
    """Replace masked positions with the mask token id."""
    return jnp.where(mask, mask_token_id, sequence)


def compute_masked_loss(logits, targets, mask):
    """Mean CE over masked positions only (reference masking_utils.py:97
    via ignore_index; here a where-mask — same value, no -100 sentinel)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(mask), 1)
    return jnp.sum(jnp.where(mask, nll, 0.0)) / denom


def create_structured_mask(
    rng: jax.Array,
    shape: tuple[int, int],
    mask_prob: float,
    min_span: int = 1,
    max_span: int = 10,
) -> jax.Array:
    """Span mask covering ~mask_prob of each row with contiguous spans.

    Jit-compatible redesign of the reference's python while-loop
    (masking_utils.py:139): sample a fixed budget of spans
    (ceil(prob*S/min_span)) with uniform starts and lengths, keep a prefix
    whose cumulative length first reaches prob*S, and OR their coverage via
    one broadcast comparison. Spans may overlap, like the reference's.
    """
    b, s = shape
    target = mask_prob * s
    n_spans = max(1, int(np.ceil(target / max(min_span, 1))))
    r_len, r_start = jax.random.split(rng)
    lens = jax.random.randint(r_len, (b, n_spans), min_span, max_span + 1)
    starts = jax.random.randint(r_start, (b, n_spans), 0, max(s - min_span, 1))
    # keep spans while cumulative length is still below the target
    keep = (jnp.cumsum(lens, axis=1) - lens) < target
    lens = jnp.where(keep, lens, 0)
    pos = jnp.arange(s)[None, None, :]  # [1, 1, S]
    covered = (pos >= starts[..., None]) & (pos < (starts + lens)[..., None])
    return jnp.any(covered, axis=1)
