"""Fused adaptive RMSNorm (Pallas) for the S2A NAR denoiser.

Why this exists: the denoiser's AdaptiveRMSNorm (reference:
maskgct/s2a/llama_nar.py:35) is called 33x per denoiser pass on a
[B, S, 1024] activation. As separate jnp ops, XLA emits a minor-dim
multiply-reduce for the variance that profiles at ~17x off HBM
speed-of-light on v5e (~230 us for [8, 650, 1024] f32 — 22% of the whole
S2A pass, PERF.md "S2A anatomy"). This kernel fuses square-reduce, rsqrt
scaling, and the conditioning-scale multiply into one pass over the rows:
x is read once and the scaled output written once, both at full tile
bandwidth.

Forward is the Pallas kernel; backward is a custom-VJP in plain jnp
(training hits it rarely and XLA handles the transposed reductions fine).
The math matches audio/s2a.py's unfused path bit-for-bit in f32: variance
in f32, rsqrt factor cast to x.dtype before multiplying, weight cast to
x.dtype.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_EPS = 1e-6


def _kernel(x_ref, w_ref, o_ref):
    x = x_ref[...]  # [1, bs, D]
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    factor = jax.lax.rsqrt(var + _EPS).astype(x.dtype)
    o_ref[...] = x * factor * w_ref[...].astype(x.dtype)


def _fwd_impl(x: jax.Array, w: jax.Array, interpret: bool) -> jax.Array:
    b, s, d = x.shape
    bs = min(s, 256)
    grid = (b, pl.cdiv(s, bs))
    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, d), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bs, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        interpret=interpret,
    )(x, w[:, None, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def ada_rmsnorm(x: jax.Array, w: jax.Array, interpret: bool = False) -> jax.Array:
    """x: [B, S, D]; w: [B, D] conditioning scale. Returns
    ``x * rsqrt(mean(x^2, -1) + 1e-6) * w[:, None, :]``."""
    return _fwd_impl(x, w, interpret)


def _fwd(x, w, interpret):
    return _fwd_impl(x, w, interpret), (x, w)


def _bwd(interpret, res, g):
    x, w = res
    xf = x.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    wf = w.astype(jnp.float32)[:, None, :]
    d = x.shape[-1]
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(var + _EPS)
    # y = x * r * w;  dx = w*g*r - x * r^3/D * sum(w*g*x);  dw = sum_s(x*r*g)
    wg = wf * gf
    dx = wg * r - xf * (r**3 / d) * jnp.sum(wg * xf, axis=-1, keepdims=True)
    dw = jnp.sum(xf * r * gf, axis=1)
    return dx.astype(x.dtype), dw.astype(w.dtype)


ada_rmsnorm.defvjp(_fwd, _bwd)
