"""Quantized matmuls (AQT) + KV-cache quantization.

Reference: MaxText/layers/quantizations.py (AqtQuantization:116,
Fp8Quantization:198, KVQuant:611). int8 training/serving uses AQT's
quantized dot_general injected into DenseGeneral; KV-cache quantization
stores int8 values + per-head f32 scales.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.lru_cache(maxsize=4)
def _aqt_cfg(mode: str):
    from aqt.jax.v2 import config as aqt_config

    if mode == "int8":
        return aqt_config.config_v4(fwd_bits=8, dlhs_bits=8, drhs_bits=None)
    if mode == "int8w":  # weight-only
        return aqt_config.config_v4(fwd_bits=8, dlhs_bits=None, drhs_bits=None)
    if mode == "fp8":
        return aqt_config.config_v4(
            fwd_bits="e4m3", dlhs_bits="e5m2", drhs_bits=None
        )
    raise ValueError(f"unknown quantization: {mode}")


def make_dot_general(quantization: str):
    """Returns a dot_general module-factory for DenseGeneral (None = lax)."""
    if not quantization:
        return None
    from aqt.jax.v2.flax import aqt_flax

    cfg = _aqt_cfg(quantization)
    return functools.partial(aqt_flax.AqtDotGeneral, cfg)


# ------------------------------------------------------------- KV quant


def quantize_kv(kv: jax.Array, axis: int = -1):
    """Symmetric per-(batch,pos,head) int8 quantization of K/V pages.
    Returns (values int8, scales f32)."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(kv.astype(jnp.float32) / jnp.maximum(scale, 1e-9))
    return q.astype(jnp.int8), scale


def dequantize_kv(values: jax.Array, scales: jax.Array, dtype=jnp.bfloat16):
    return (values.astype(jnp.float32) * scales).astype(dtype)
