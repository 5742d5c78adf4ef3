"""Rotary position embeddings.

Functional RoPE variants (reference: MaxText/layers/embeddings.py:235
RotaryEmbedding, :354 LLaMARotaryEmbedding, :534 YarnRotaryEmbedding).
Pure functions of (x, positions) — no params — so they fuse into the
surrounding attention projections under XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def rope_frequencies(
    head_dim: int,
    rope_type: str = "default",
    max_timescale: float = 10_000.0,
    factor: float = 8.0,
    low_freq_factor: float = 1.0,
    high_freq_factor: float = 4.0,
    original_max_position: int = 8192,
) -> np.ndarray:
    """Per-pair inverse frequencies, shape [head_dim//2], float32 (host-side)."""
    half = head_dim // 2
    inv_freq = 1.0 / (max_timescale ** (np.arange(0, half, dtype=np.float64) / half))

    if rope_type == "llama3.1":
        # NTK-by-parts frequency scaling (llama 3.1).
        low_wavelen = original_max_position / low_freq_factor
        high_wavelen = original_max_position / high_freq_factor
        wavelen = 2 * np.pi / inv_freq
        scaled = np.where(wavelen > low_wavelen, inv_freq / factor, inv_freq)
        smooth = (original_max_position / wavelen - low_freq_factor) / (
            high_freq_factor - low_freq_factor
        )
        mid = (1 - smooth) * inv_freq / factor + smooth * inv_freq
        is_mid = (wavelen <= low_wavelen) & (wavelen >= high_wavelen)
        inv_freq = np.where(is_mid, mid, scaled)
    elif rope_type == "yarn":
        # YaRN ramp interpolation between interpolated and extrapolated freqs.
        low = max(np.floor(half * np.log(original_max_position / (low_freq_factor * 2 * np.pi))
                           / np.log(max_timescale)), 0)
        high = min(np.ceil(half * np.log(original_max_position / (high_freq_factor * 2 * np.pi))
                           / np.log(max_timescale)), half - 1)
        ramp = np.clip((np.arange(half) - low) / max(high - low, 1e-3), 0, 1)
        inv_freq = inv_freq / factor * ramp + inv_freq * (1 - ramp)
    elif rope_type not in ("default", "none"):
        raise ValueError(f"unknown rope_type: {rope_type}")
    return inv_freq.astype(np.float32)


def apply_rope(
    x: jax.Array,
    positions: jax.Array,
    inv_freq: jax.Array | np.ndarray,
    interleave: bool = False,
    attention_scaling: float = 1.0,
) -> jax.Array:
    """Rotate q or k.

    Args:
      x: [B, S, N, D] (or [B, S, D]).
      positions: [B, S] int positions.
      inv_freq: [D//2] from :func:`rope_frequencies`.
      interleave: True for (x0,x1),(x2,x3) pairing (GPT-NeoX style False =
        split-halves pairing, the llama convention).
    """
    angles = positions[..., None].astype(jnp.float32) * jnp.asarray(inv_freq)[None, None, :]
    sin, cos = jnp.sin(angles), jnp.cos(angles)  # [B, S, D//2]
    if attention_scaling != 1.0:
        sin = sin * attention_scaling
        cos = cos * attention_scaling
    expand = x.ndim - 3  # broadcast over head dim if present
    for _ in range(expand):
        sin = sin[..., None, :]
        cos = cos[..., None, :]

    in_dtype = x.dtype
    x = x.astype(jnp.float32)
    if interleave:
        x1 = x[..., ::2]
        x2 = x[..., 1::2]
        r1 = x1 * cos - x2 * sin
        r2 = x2 * cos + x1 * sin
        out = jnp.stack([r1, r2], axis=-1).reshape(x.shape)
    else:
        half = x.shape[-1] // 2
        x1, x2 = x[..., :half], x[..., half:]
        out = jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)
    return out.astype(in_dtype)


def yarn_attention_scaling(factor: float) -> float:
    """mscale: temperature adjustment used with YaRN (deepseek convention)."""
    if factor <= 1.0:
        return 1.0
    return 0.1 * float(np.log(factor)) + 1.0
