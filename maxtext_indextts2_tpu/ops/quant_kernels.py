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


def _row_block(s: int, k: int) -> int:
    """Rows per block: keep each f32 input block <= 2 MB so double-buffered
    in/out blocks fit the 16 MB VMEM scoped limit (observed 18.25M OOM at
    bs=256, K=4096 with two f32 inputs). Multiple of 8 (sublane)."""
    return min(s, 256, max(8, (2 * 1024 * 1024) // (4 * k)))


def _quantize_rows(y, q_ref, s_ref):
    """y: [1, bs, K] f32 -> int8 rows + [1, bs, 1] scales into the out refs.

    The scale ref is [1, bs, 1] (not [1, bs]): Mosaic requires the block's
    sublane dim be a multiple of 8 or the full array dim, which a (1, bs)
    block over a [B, S] array violates. A trailing size-1 lane dim makes the
    block (bs, 1) in the checked trailing dims — bs%8==0 and 1==array dim.
    """
    amax = jnp.max(jnp.abs(y), axis=-1)  # [1, bs]
    scale = amax / 127.0
    q = jnp.round(y / jnp.maximum(scale, 1e-9)[..., None])
    q_ref[...] = q.astype(jnp.int8)
    s_ref[...] = scale[..., None]


def _kernel(x_ref, q_ref, s_ref):
    _quantize_rows(x_ref[...].astype(jnp.float32), q_ref, s_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def row_quantize_int8(x: jax.Array, interpret: bool = False):
    """x: [B, S, K] float -> (xq int8 [B, S, K], scales f32 [B, S]).

    Per-row symmetric absmax quantization in ONE pass over x. K must be a
    multiple of 128 (TPU lane width).
    """
    b, s, k = x.shape
    bs = _row_block(s, k)
    grid = (b, pl.cdiv(s, bs))
    q, sc = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0))],
        out_specs=[
            pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, k), jnp.int8),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x)
    return q, sc[..., 0]


# ------------------------------------------------- producer-fused variants
#
# The quant sites in the S2A NAR block are all fed by ops this file can
# absorb, skipping the float round-trip through HBM entirely:
#   qkv-in      = AdaptiveRMSNorm output        -> ada_rmsnorm_quantize
#   gate/up-in  = AdaptiveRMSNorm output        -> ada_rmsnorm_quantize
#   down-in     = silu(gate) * up               -> silu_mul_quantize
# (out-in, the attention output, stays on row_quantize_int8.)


def _ada_quant_kernel(x_ref, w_ref, q_ref, s_ref):
    x = x_ref[...]  # [1, bs, D]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    factor = jax.lax.rsqrt(var + 1e-6).astype(x.dtype)
    y = x * factor * w_ref[...].astype(x.dtype)  # == ops.ada_rmsnorm output
    _quantize_rows(y.astype(jnp.float32), q_ref, s_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def ada_rmsnorm_quantize(x: jax.Array, w: jax.Array, interpret: bool = False):
    """Fused AdaptiveRMSNorm + row int8 quantization.

    x: [B, S, D]; w: [B, D] conditioning scale. Returns (q int8 [B,S,D],
    scales f32 [B,S]) of ``ada_rmsnorm(x, w)`` without materializing the
    normalized float tensor in HBM. Bit-matches ops.ada_rmsnorm followed by
    row_quantize_int8.
    """
    b, s, d = x.shape
    bs = _row_block(s, d)
    grid = (b, pl.cdiv(s, bs))
    q, sc = pl.pallas_call(
        _ada_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, d), jnp.int8),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ],
        interpret=interpret,
    )(x, w[:, None, :])
    return q, sc[..., 0]


def _silu_mul_quant_kernel(g_ref, u_ref, q_ref, s_ref):
    g = g_ref[...]
    # Mosaic can't lower bf16 logistic (f32->bf16 vector.broadcast verifier
    # error); compute the sigmoid in f32 and round back to the input dtype,
    # which is also what XLA does for bf16 logistic.
    sig = jax.lax.logistic(g.astype(jnp.float32)).astype(g.dtype)
    y = g * sig * u_ref[...]
    _quantize_rows(y.astype(jnp.float32), q_ref, s_ref)


@functools.partial(jax.jit, static_argnames=("interpret",))
def silu_mul_quantize(g: jax.Array, u: jax.Array, interpret: bool = False):
    """Fused SwiGLU elementwise + row int8 quantization.

    g, u: [B, S, K]. Returns (q int8 [B,S,K], scales f32 [B,S]) of
    ``silu(g) * u`` without the float product round-tripping HBM.
    """
    b, s, k = g.shape
    bs = _row_block(s, k)
    grid = (b, pl.cdiv(s, bs))
    q, sc = pl.pallas_call(
        _silu_mul_quant_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bs, k), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bs, 1), lambda i, j: (i, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, s, k), jnp.int8),
            jax.ShapeDtypeStruct((b, s, 1), jnp.float32),
        ],
        interpret=interpret,
    )(g, u)
    return q, sc[..., 0]
