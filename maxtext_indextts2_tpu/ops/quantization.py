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
    Returns (values int8 [..., d], scales f32 [...]) — the reduced axis is
    DROPPED from the scales: a trailing size-1 lane dim would be padded to
    128 lanes by TPU tiling (measured 128x HBM expansion, 8MB -> 1GB per
    cache scale buffer at 128 slots)."""
    amax = jnp.max(jnp.abs(kv.astype(jnp.float32)), axis=axis, keepdims=True)
    scale = amax / 127.0
    q = jnp.round(kv.astype(jnp.float32) / jnp.maximum(scale, 1e-9))
    return q.astype(jnp.int8), jnp.squeeze(scale, axis=axis)


def dequantize_kv(values: jax.Array, scales: jax.Array, dtype=jnp.bfloat16):
    """values [..., d] int8, scales [...] f32 (one per leading-dim row)."""
    return (values.astype(jnp.float32) * scales[..., None]).astype(dtype)


# ------------------------------------------------- serving weight quant


def quantize_params_for_serving(params, abstract):
    """Convert a float params tree into the ``int8w_serve`` structure.

    ``abstract`` is the (eval_shape) params tree of a model built with
    quantization="int8w_serve": quantized weights appear as int8 leaves with
    a sibling ``<name>_scale`` (DenseGeneral's kernel/kernel_scale, MoE's
    wi_0/wi_1/wo + *_scale). Every such weight in ``params`` is
    symmetric-quantized per output channel (the scale's size-1 axes are the
    reduced ones); all other leaves pass through.
    Reference: MaxText/maxengine.py:318 quantize_params (AQT convert mode).
    """

    def convert(node, ab):
        if isinstance(ab, dict):
            out = {}
            for key, sub_ab in ab.items():
                if key.endswith("_scale") and key[:-6] in ab:
                    continue  # produced together with its weight
                sub = node[key]
                scale_key = f"{key}_scale"
                if (
                    scale_key in ab
                    and getattr(sub_ab, "dtype", None) == jnp.int8
                ):
                    scale_shape = ab[scale_key].shape
                    red = tuple(
                        i for i, d in enumerate(scale_shape) if d == 1
                    )
                    w = sub.astype(jnp.float32)
                    amax = jnp.max(jnp.abs(w), axis=red, keepdims=True)
                    scale = jnp.maximum(amax, 1e-9) / 127.0
                    out[key] = (
                        jnp.round(w / scale).clip(-127, 127).astype(jnp.int8)
                    )
                    out[scale_key] = scale
                else:
                    out[key] = convert(sub, sub_ab)
            return out
        return node

    return convert(params, abstract)
