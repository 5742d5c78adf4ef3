"""Fused dynamic-quantization Pallas kernels (TPU).

Why this exists: the S2A denoiser's int8 serving mode (audio/s2a.py
Int8Dense) quantizes every matmul input on the fly. As separate jnp ops,
XLA emits the row-absmax reduce and the scale/round/convert as two
standalone passes over the activation (measured ~500 ms of a 2.48 s pass,
PERF.md "S2A int8 anatomy") — and the [rows, 1] scale intermediate gets
lane-padded 128x by TPU tiling. This kernel reads the activation once per
block, computes the row absmax in VMEM, and writes the int8 tensor plus a
COMPACT [B, S] scale array in a single pass.

Math matches the jnp path exactly (same op order in f32):
  xs = max|x| / 127;  xq = round_nearest_even(x / max(xs, 1e-9))
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, q_ref, s_ref):
    x = x_ref[...].astype(jnp.float32)  # [1, bs, K]
    amax = jnp.max(jnp.abs(x), axis=-1)  # [1, bs]
    scale = amax / 127.0
    q = jnp.round(x / jnp.maximum(scale, 1e-9)[..., None])
    q_ref[...] = q.astype(jnp.int8)
    s_ref[...] = scale


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_quantize_int8(x: jax.Array, interpret: bool = False):
    """x: [B, S, K] float -> (xq int8 [B, S, K], scales f32 [B, S]).

    Per-row symmetric absmax quantization in ONE pass over x. K must be a
    multiple of 128 (TPU lane width).
    """
    b, s, k = x.shape
    bs = min(s, 256)
    grid = (b, pl.cdiv(s, bs))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0))],
        out_specs=[
            pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs), lambda i, j: (i, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, k), jnp.int8),
            jax.ShapeDtypeStruct((b, s), jnp.float32),
        ],
        interpret=interpret,
    )(x)
