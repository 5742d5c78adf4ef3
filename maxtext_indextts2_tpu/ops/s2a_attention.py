"""One-shot fused attention (Pallas) for the S2A NAR denoiser sampler.

Status: MEASURED AND OFF BY DEFAULT on v5e (set MTT_S2A_FLASH=1 to enable).
The idea: the denoiser (reference: maskgct/s2a/llama_nar.py DiffLlama —
non-causal, S~650, 16 heads of d=64) runs ~108 forwards per reverse-diffusion
pass, and the whole K/V of one (batch, head) fits in VMEM, so one grid step
can compute QK^T -> masked f32 softmax -> P@V without the S x S matrix ever
touching HBM.

Measured verdict (2026-08-17, PERF.md "S2A fused-attention kernel"): the XLA
path's attention costs only ~0.41 s of the 2.76 s pass (bf16 logits, single
S^2 materialization); this kernel runs the same math in ~0.45 s (74 TFLOP/s —
the d=64 contract dim caps the MXU at half throughput and per-(b,n) grid
steps serialize VPU softmax against MXU dots) and its layout needs
(swapaxes to [B,N,S,D] + pad-to-128) add ~0.22 s of copies: net +0.10 s
per pass. A heads-per-step variant that would skip the transposes fails to
compile ("infer-vector-layout: unsupported shape cast" — Mosaic cannot slice
heads out of a [S, N, D] block). Kept as a tested artifact: the tradeoff may
flip on chips with more VMEM / different MXU geometry.

Scope: the SAMPLER only. reverse_diffusion always runs with all-ones pad
masks (audio/s2a.py builds x_mask/full_mask as jnp.ones), so the kernel only
masks the pad-to-128-multiple tail, which is static. Training keeps the
einsum path (real padding + gradients).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_NEG = -1e9


def _one_head(q, k, v, valid: int, out_dtype):
    """softmax(q k^T) v for one [S, D] head; S x S stays in registers/VMEM."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [S, S]
    spad = s.shape[-1]
    if valid < spad:
        col = jax.lax.broadcasted_iota(jnp.int32, (1, spad), 1)
        s = jnp.where(col < valid, s, _NEG)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    p = p / jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return o.astype(out_dtype)


def _kernel(valid: int, q_ref, k_ref, v_ref, o_ref):
    q = q_ref[...].reshape(q_ref.shape[2], q_ref.shape[3])  # [S, D]
    k = k_ref[...].reshape(k_ref.shape[2], k_ref.shape[3])
    v = v_ref[...].reshape(v_ref.shape[2], v_ref.shape[3])
    o = _one_head(q, k, v, valid, o_ref.dtype)
    o_ref[...] = o.reshape(o_ref.shape)


def _kernel_heads(valid: int, q_ref, k_ref, v_ref, o_ref):
    """One grid step = one batch row, python-unrolled loop over heads.

    The heads are independent, so Mosaic can overlap head h's VPU softmax
    with head h+1's MXU dots — the per-(b, n) variant serializes them.
    Blocks are [1, S, N, D] straight off the projection layout (no host-side
    transpose); the per-head slice is an in-VMEM relayout.
    """
    n = q_ref.shape[2]
    for h in range(n):
        q = q_ref[0, :, h, :]
        k = k_ref[0, :, h, :]
        v = v_ref[0, :, h, :]
        o_ref[0, :, h, :] = _one_head(q, k, v, valid, o_ref.dtype)


def s2a_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                  interpret: bool = False, variant: str | None = None) -> jax.Array:
    """Non-causal softmax(q k^T) v with every position attending every valid
    position. q, k, v: [B, S, N, D] (scale pre-folded into q). Returns
    [B, S, N, D] in q.dtype.
    """
    import os

    b, s, n, d = q.shape
    spad = -(-s // 128) * 128
    if spad != s:
        pad = [(0, 0), (0, spad - s), (0, 0), (0, 0)]
        q, k, v = (jnp.pad(x, pad) for x in (q, k, v))
    # "bn" is the only variant Mosaic compiles on v5e; "heads" kept for
    # interpret-mode study (see module docstring).
    variant = variant or os.environ.get("MTT_S2A_FLASH_VARIANT", "bn")
    if variant == "heads":
        # grid over batch only; the kernel loops heads in the projection's
        # native [B, S, N, D] layout — no host-side transposes.
        out = pl.pallas_call(
            functools.partial(_kernel_heads, s),
            grid=(b,),
            in_specs=[pl.BlockSpec((1, spad, n, d), lambda i: (i, 0, 0, 0))] * 3,
            out_specs=pl.BlockSpec((1, spad, n, d), lambda i: (i, 0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, spad, n, d), q.dtype),
            interpret=interpret,
        )(q, k, v)
        return out[:, :s]
    # per-(b, n) variant: needs [B, N, S, D] so (S, D) are the trailing
    # block dims — the swapaxes are real HBM copies (~0.13 s/pass measured).
    q, k, v = (jnp.swapaxes(x, 1, 2) for x in (q, k, v))
    out = pl.pallas_call(
        functools.partial(_kernel, s),
        grid=(b, n),
        in_specs=[
            pl.BlockSpec((1, 1, spad, d), lambda i, j: (i, j, 0, 0))
        ] * 3,
        out_specs=pl.BlockSpec((1, 1, spad, d), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, spad, d), q.dtype),
        interpret=interpret,
    )(q, k, v)
    return jnp.swapaxes(out, 1, 2)[:, :s]
