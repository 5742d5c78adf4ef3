"""Ring attention: context parallelism with K/V sharded over the ring.

The reference's context parallelism keeps K/V FULL per device and shards only
Q (MaxText layers/attentions.py:989-998); SURVEY.md notes it has "no ring
attention". This module goes beyond that capability: each device holds only
S/cp of K/V and rotates its shard one hop around the "context" mesh axis per
step (`lax.ppermute`), merging per-shard flash partials with the standard
log-sum-exp combine. Peak attention memory is O(S/cp) for K/V instead of
O(S), which is what unlocks sequence lengths where the all-gathered KV no
longer fits HBM. Compute rides the existing Pallas flash kernel
(ops/flash_attention.py) unchanged — global positions/segments travel with
the K/V blocks, so causal, sliding-window, chunked and packed masks (and the
load-balanced causal reorder) all stay correct without any ring-specific
mask logic.

Backward follows the classic ring schedule: dQ accumulates locally while
dK/dV travel WITH their K/V blocks; after cp hops every grad is back at its
home shard. Grad accumulators are f32 regardless of the compute dtype.

Usage: inside `jax.shard_map` over the context axis (see
flash_attention.flash_attention_sharded(algorithm="ring")).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from maxtext_indextts2_tpu.ops.flash_attention import _flash_bwd, _flash_fwd

_NEG_INF = float("-inf")


def _merge(o_a, lse_a, o_b, lse_b):
    """Combine two normalized flash partials (o_i [.., D] f32, lse_i [.., 1]).

    Empty partials carry lse == -inf and o == 0; the weights are zeroed for
    them explicitly so -inf - -inf never produces a NaN.
    """
    lse = jnp.logaddexp(lse_a, lse_b)
    w_a = jnp.where(jnp.isneginf(lse_a), 0.0, jnp.exp(lse_a - lse))
    w_b = jnp.where(jnp.isneginf(lse_b), 0.0, jnp.exp(lse_b - lse))
    return o_a * w_a + o_b * w_b, lse


def _ring_perm(cp: int):
    return [(i, (i + 1) % cp) for i in range(cp)]


def _ring_fwd(q, k, v, q_pos, kv_pos, q_seg, kv_seg,
              axis_name, causal, sliding_window, chunk_size, soft_cap,
              scale, block_q, block_kv):
    cp = lax.psum(1, axis_name)
    perm = _ring_perm(cp)
    b, h, sq, d = q.shape

    def body(carry, _):
        k_c, v_c, kp_c, ks_c, o_acc, lse_acc = carry
        o_b, lse_b = _flash_fwd(
            q, k_c, v_c, q_pos, kp_c, q_seg, ks_c,
            causal, sliding_window, chunk_size, soft_cap, scale,
            block_q, block_kv,
        )
        o_acc, lse_acc = _merge(o_acc, lse_acc, o_b.astype(jnp.float32), lse_b)
        carry = (
            lax.ppermute(k_c, axis_name, perm),
            lax.ppermute(v_c, axis_name, perm),
            lax.ppermute(kp_c, axis_name, perm),
            lax.ppermute(ks_c, axis_name, perm),
            o_acc,
            lse_acc,
        )
        return carry, None

    init = (
        k, v, kv_pos, kv_seg,
        jnp.zeros((b, h, sq, d), jnp.float32),
        jnp.full((b, h, sq, 1), _NEG_INF, jnp.float32),
    )
    (_, _, _, _, o, lse), _ = lax.scan(body, init, None, length=cp)
    return o, lse


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13, 14))
def ring_flash_attention(q, k, v, q_pos, kv_pos, q_seg, kv_seg,
                         axis_name, causal=True, sliding_window=0,
                         chunk_size=0, soft_cap=0.0, sm_scale=None,
                         block_q=512, block_kv=512):
    """Ring flash attention over LOCAL shards (call inside shard_map).

    q:[B,H,Sq/cp,D], k/v:[B,Hkv,Skv/cp,D]; pos/seg hold GLOBAL positions /
    segment ids for the local tokens. Returns [B,H,Sq/cp,D] in q.dtype.
    """
    scale = sm_scale if sm_scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    o, _ = _ring_fwd(q, k, v, q_pos, kv_pos, q_seg, kv_seg,
                     axis_name, causal, sliding_window, chunk_size, soft_cap,
                     scale, block_q, block_kv)
    return o.astype(q.dtype)


def _ring_vjp_fwd(q, k, v, q_pos, kv_pos, q_seg, kv_seg,
                  axis_name, causal, sliding_window, chunk_size, soft_cap,
                  sm_scale, block_q, block_kv):
    scale = sm_scale if sm_scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    o, lse = _ring_fwd(q, k, v, q_pos, kv_pos, q_seg, kv_seg,
                       axis_name, causal, sliding_window, chunk_size, soft_cap,
                       scale, block_q, block_kv)
    o = o.astype(q.dtype)
    return o, (q, k, v, q_pos, kv_pos, q_seg, kv_seg, o, lse)


def _ring_vjp_bwd(axis_name, causal, sliding_window, chunk_size, soft_cap,
                  sm_scale, block_q, block_kv, res, g):
    q, k, v, q_pos, kv_pos, q_seg, kv_seg, o, lse = res
    scale = sm_scale if sm_scale is not None else 1.0 / (q.shape[-1] ** 0.5)
    cp = lax.psum(1, axis_name)
    perm = _ring_perm(cp)

    def body(carry, _):
        k_c, v_c, kp_c, ks_c, dk_c, dv_c, dq_acc = carry
        dq_b, dk_b, dv_b, *_ = _flash_bwd(
            (q, k_c, v_c, q_pos, kp_c, q_seg, ks_c, o, lse), (g,),
            causal, sliding_window, chunk_size, soft_cap, scale,
            block_q, block_kv,
        )
        # dK/dV ride the ring with their K/V blocks; after cp hops they are
        # back at the block's home shard with every contribution summed
        carry = (
            lax.ppermute(k_c, axis_name, perm),
            lax.ppermute(v_c, axis_name, perm),
            lax.ppermute(kp_c, axis_name, perm),
            lax.ppermute(ks_c, axis_name, perm),
            lax.ppermute(dk_c + dk_b.astype(jnp.float32), axis_name, perm),
            lax.ppermute(dv_c + dv_b.astype(jnp.float32), axis_name, perm),
            dq_acc + dq_b.astype(jnp.float32),
        )
        return carry, None

    init = (
        k, v, kv_pos, kv_seg,
        jnp.zeros(k.shape, jnp.float32),
        jnp.zeros(v.shape, jnp.float32),
        jnp.zeros(q.shape, jnp.float32),
    )
    (_, _, _, _, dk, dv, dq), _ = lax.scan(body, init, None, length=cp)
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            None, None, None, None)


ring_flash_attention.defvjp(_ring_vjp_fwd, _ring_vjp_bwd)
