"""Flash attention for TPU (Pallas), forward + backward, with shard_map
context parallelism.

The framework's counterpart to the reference's splash-attention tier
(reference: MaxText/kernels/splash_attention_kernel.py, used from
MaxText/layers/attentions.py:847 tpu_flash_attention). Design is TPU-first
rather than a port:

- Masks derive from *position/segment blocks*, so one kernel covers causal,
  packing (segment ids), sliding-window, chunked attention, and
  context-parallel load-balanced reordering (non-contiguous per-shard
  positions) — no HBM mask materialization, no per-mask kernel variants.
- Blocks are classified in-kernel (empty / fully-visible / partial) from 8
  scalar reductions over the pos/seg blocks: off-diagonal blocks skip ALL
  elementwise mask work and empty blocks skip compute entirely. (An
  SMEM-prefetched classification was measured 3x slower on v5e — dynamic
  SMEM scalar reads stall Mosaic's pipeline.)
- Running softmax stats (m, l) are stored (block_q, 128)-shaped — sublane
  aligned — because 1-D lane-major vectors force a lane->sublane relayout
  against the (block_q, d) accumulator on every kv step. LSE/delta use a
  [B, H, S, 1] layout for the same reason.
- GQA reads K/V through a (batch, kv_head) index map — no head replication.
- Backward = two kernels (dq; dk/dv) re-using saved LSE; the dk/dv grid
  folds the whole GQA head-group into the innermost dimension so scratch
  accumulates across the group before one output write.

Context parallelism (reference: attentions.py:972 q_seq_shards +
max_utils.py:788 reorder_sequence): Q is sharded over the "context" mesh
axis inside shard_map with K/V gathered full per device; the load-balanced
global reorder gives every shard one chunk from the front and the mirrored
chunk from the back. Because masks come from explicit positions, no inverse
permutation is needed inside the kernel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import Mesh, PartitionSpec as P

DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

_DIMSEM = ("parallel", "parallel", "parallel", "arbitrary")


def _mask_block(q_pos, kv_pos, q_seg, kv_seg, causal, sliding_window, chunk_size):
    """[bq, bkv] bool mask. q_pos/q_seg: (bq,1); kv_pos/kv_seg: (1,bkv)."""
    mask = (q_seg == kv_seg) & (q_seg != 0)
    if causal:
        mask &= kv_pos <= q_pos
    if sliding_window > 0:
        mask &= kv_pos > q_pos - sliding_window
    if chunk_size > 0:
        mask &= (q_pos // chunk_size) == (kv_pos // chunk_size)
    return mask


def _block_class_inkernel(q_pos, kv_pos, q_seg, kv_seg, causal, sliding_window, chunk_size):
    """(empty, full) scalars from VMEM pos/seg blocks — 8 small reductions.
    SMEM-prefetched classes measured 3x slower on v5e (dynamic SMEM scalar
    reads stall Mosaic's pipeline); in-kernel VPU reductions are cheap."""
    q_lo, q_hi = jnp.min(q_pos), jnp.max(q_pos)
    k_lo, k_hi = jnp.min(kv_pos), jnp.max(kv_pos)
    qs_lo, qs_hi = jnp.min(q_seg), jnp.max(q_seg)
    ks_lo, ks_hi = jnp.min(kv_seg), jnp.max(kv_seg)
    uniform = (qs_lo == qs_hi) & (ks_lo == ks_hi)
    seg_match = uniform & (qs_lo == ks_lo) & (qs_lo != 0)
    seg_disjoint = (qs_hi < ks_lo) | (ks_hi < qs_lo) | (qs_hi == 0)
    empty = seg_disjoint
    full = seg_match
    if causal:
        empty |= k_lo > q_hi
        full &= k_hi <= q_lo
    if sliding_window > 0:
        empty |= k_hi <= q_lo - sliding_window
        full &= k_lo > q_hi - sliding_window
    if chunk_size > 0:
        empty |= ((q_hi // chunk_size) < (k_lo // chunk_size)) | (
            (q_lo // chunk_size) > (k_hi // chunk_size))
        full &= ((q_lo // chunk_size) == (q_hi // chunk_size)) & \
                ((k_lo // chunk_size) == (k_hi // chunk_size)) & \
                ((q_lo // chunk_size) == (k_lo // chunk_size))
    return empty, full


# ----------------------------------------------------------------- forward


def _fwd_kernel(
    q_ref, k_ref, v_ref, qpos_ref, kpos_ref, qseg_ref, kseg_ref,
    o_ref, lse_ref,
    acc_ref, m_ref, l_ref,
    *, causal, sliding_window, chunk_size, soft_cap, sm_scale, num_kv_blocks,
):
    j = pl.program_id(3)
    empty, full = _block_class_inkernel(
        qpos_ref[0, 0], kpos_ref[0, 0], qseg_ref[0, 0], kseg_ref[0, 0],
        causal, sliding_window, chunk_size,
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    def _accumulate(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        s = s * sm_scale
        if soft_cap > 0.0:
            s = soft_cap * jnp.tanh(s / soft_cap)
        if masked:
            mask = _mask_block(
                qpos_ref[0, 0].reshape(-1, 1), kpos_ref[0, 0].reshape(1, -1),
                qseg_ref[0, 0].reshape(-1, 1), kseg_ref[0, 0].reshape(1, -1),
                causal, sliding_window, chunk_size,
            )
            s = jnp.where(mask, s, DEFAULT_MASK_VALUE)

        m_prev = m_ref[:]  # (bq, 128) lane-replicated
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=1, keepdims=True)  # (bq, 1) sublane-aligned
        m_next = jnp.maximum(m_prev, m_cur)  # broadcast over lanes
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - m_next[:, :1])
        if masked:
            # for a fully-masked row all s == MASK_VALUE and exp(s-max) == 1
            p = jnp.where(mask, p, 0.0)
        l_ref[:] = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        m_ref[:] = m_next

        d = acc_ref.shape[-1]
        scale = alpha[:, :d] if d <= alpha.shape[1] else alpha[:, :1]
        acc_ref[:] = acc_ref[:] * scale + jax.lax.dot_general(
            p.astype(v_ref.dtype), v_ref[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(full)
    def _full():
        _accumulate(masked=False)

    @pl.when(jnp.logical_not(empty | full))
    def _partial():
        _accumulate(masked=True)

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        l = l_ref[:, :1]
        l_safe = jnp.where(l == 0.0, 1.0, l)
        o_ref[0, 0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        lse = m_ref[:, :1] + jnp.log(l_safe)
        lse_ref[0, 0] = jnp.where(l == 0.0, -jnp.inf, lse)


def _flash_fwd(
    q, k, v, q_pos, kv_pos, q_seg, kv_seg,
    causal, sliding_window, chunk_size, soft_cap, sm_scale,
    block_q, block_kv,
):
    """q:[B,H,Sq,D] k,v:[B,Hkv,Skv,D]; pos/seg:[B,S]. Returns (o, lse[B,H,Sq,1])."""
    b, h, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = h // hkv
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    nq = pl.cdiv(sq, block_q)
    nkv = pl.cdiv(skv, block_kv)

    # [B,1,S] keeps the trailing-two-dims tiling constraint happy
    qp, kp = q_pos[:, None, :], kv_pos[:, None, :]
    qs, ks = q_seg[:, None, :], kv_seg[:, None, :]

    o, lse = pl.pallas_call(
        functools.partial(
            _fwd_kernel,
            causal=causal, sliding_window=sliding_window, chunk_size=chunk_size,
            soft_cap=soft_cap, sm_scale=sm_scale, num_kv_blocks=nkv,
        ),
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, i, j, g=group: (bb, hh // g, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, i, j, g=group: (bb, hh // g, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, hh, i, j: (bb, 0, i)),
            pl.BlockSpec((1, 1, block_kv), lambda bb, hh, i, j: (bb, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda bb, hh, i, j: (bb, 0, i)),
            pl.BlockSpec((1, 1, block_kv), lambda bb, hh, i, j: (bb, 0, j)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, hh, i, j: (bb, hh, i, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
            jax.ShapeDtypeStruct((b, h, sq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=_DIMSEM),
        interpret=_should_interpret(),
    )(q, k, v, qp, kp, qs, ks)
    return o, lse


# ----------------------------------------------------------------- backward


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, qpos_ref, kpos_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, causal, sliding_window, chunk_size, soft_cap, sm_scale, num_kv_blocks,
):
    j = pl.program_id(3)
    empty, full = _block_class_inkernel(
        qpos_ref[0, 0], kpos_ref[0, 0], qseg_ref[0, 0], kseg_ref[0, 0],
        causal, sliding_window, chunk_size,
    )

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    def _compute(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if soft_cap > 0.0:
            th = jnp.tanh(s / soft_cap)
            s_capped = soft_cap * th
            dcap = 1.0 - th * th
        else:
            s_capped = s
            dcap = None
        lse = lse_ref[0, 0]  # (bq, 1)
        if masked:
            mask = _mask_block(
                qpos_ref[0, 0].reshape(-1, 1), kpos_ref[0, 0].reshape(1, -1),
                qseg_ref[0, 0].reshape(-1, 1), kseg_ref[0, 0].reshape(1, -1),
                causal, sliding_window, chunk_size,
            )
            s_capped = jnp.where(mask, s_capped, DEFAULT_MASK_VALUE)
            p = jnp.exp(s_capped - lse)
            p = jnp.where(mask, p, 0.0)
        else:
            p = jnp.exp(s_capped - lse)

        do = do_ref[0, 0].astype(jnp.float32)
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0])
        if dcap is not None:
            ds = ds * dcap
        ds = ds * sm_scale
        dq_acc[:] += jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(full)
    def _full():
        _compute(masked=False)

    @pl.when(jnp.logical_not(empty | full))
    def _partial():
        _compute(masked=True)

    @pl.when(j == num_kv_blocks - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, qpos_ref, kpos_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, causal, sliding_window, chunk_size, soft_cap, sm_scale, num_inner, group,
):
    # grid: (b, h_kv, kv_block, group*q_blocks): the innermost dimension walks
    # every (q_head in group, q_block) pair so dk/dv accumulate in scratch
    # across the whole GQA group before one output write — Pallas does not
    # restore previously-written output blocks on revisit.
    t = pl.program_id(3)
    empty, full = _block_class_inkernel(
        qpos_ref[0, 0], kpos_ref[0, 0], qseg_ref[0, 0], kseg_ref[0, 0],
        causal, sliding_window, chunk_size,
    )

    @pl.when(t == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def _compute(masked: bool):
        q = q_ref[0, 0]
        k = k_ref[0, 0]
        v = v_ref[0, 0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * sm_scale
        if soft_cap > 0.0:
            th = jnp.tanh(s / soft_cap)
            s_capped = soft_cap * th
            dcap = 1.0 - th * th
        else:
            s_capped = s
            dcap = None
        lse = lse_ref[0, 0]  # (bq, 1)
        if masked:
            mask = _mask_block(
                qpos_ref[0, 0].reshape(-1, 1), kpos_ref[0, 0].reshape(1, -1),
                qseg_ref[0, 0].reshape(-1, 1), kseg_ref[0, 0].reshape(1, -1),
                causal, sliding_window, chunk_size,
            )
            s_capped = jnp.where(mask, s_capped, DEFAULT_MASK_VALUE)
            p = jnp.exp(s_capped - lse)
            p = jnp.where(mask, p, 0.0)
        else:
            p = jnp.exp(s_capped - lse)

        do = do_ref[0, 0].astype(jnp.float32)
        dv_acc[:] += jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dp = jax.lax.dot_general(
            do, v.astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ds = p * (dp - delta_ref[0, 0])
        if dcap is not None:
            ds = ds * dcap
        ds = ds * sm_scale
        dk_acc[:] += jax.lax.dot_general(
            ds, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(full)
    def _full():
        _compute(masked=False)

    @pl.when(jnp.logical_not(empty | full))
    def _partial():
        _compute(masked=True)

    @pl.when(t == num_inner - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd(
    res, g,
    causal, sliding_window, chunk_size, soft_cap, sm_scale, block_q, block_kv,
):
    q, k, v, q_pos, kv_pos, q_seg, kv_seg, o, lse = res
    do = g[0]
    b, h, sq, d = q.shape
    hkv, skv = k.shape[1], k.shape[2]
    group = h // hkv
    block_q = min(block_q, sq)
    block_kv = min(block_kv, skv)
    nq = pl.cdiv(sq, block_q)
    nkv = pl.cdiv(skv, block_kv)

    delta = jnp.sum(
        o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True
    )  # [B,H,Sq,1]
    qp, kp = q_pos[:, None, :], kv_pos[:, None, :]
    qs, ks = q_seg[:, None, :], kv_seg[:, None, :]

    dq = pl.pallas_call(
        functools.partial(
            _bwd_dq_kernel,
            causal=causal, sliding_window=sliding_window, chunk_size=chunk_size,
            soft_cap=soft_cap, sm_scale=sm_scale, num_kv_blocks=nkv,
        ),
        grid=(b, h, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, i, j, g_=group: (bb, hh // g_, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, i, j, g_=group: (bb, hh // g_, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, hh, i, j: (bb, 0, i)),
            pl.BlockSpec((1, 1, block_kv), lambda bb, hh, i, j: (bb, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda bb, hh, i, j: (bb, 0, i)),
            pl.BlockSpec((1, 1, block_kv), lambda bb, hh, i, j: (bb, 0, j)),
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, hh, i, j: (bb, hh, i, 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, hh, i, j: (bb, hh, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, i, j: (bb, hh, i, 0)),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        out_shape=jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(dimension_semantics=_DIMSEM),
        interpret=_should_interpret(),
    )(q, k, v, qp, kp, qs, ks, do, lse, delta)

    num_inner = group * nq

    def qh(hh, t):
        return hh * group + t // nq

    def qb(t):
        return t % nq

    dk, dv = pl.pallas_call(
        functools.partial(
            _bwd_dkv_kernel,
            causal=causal, sliding_window=sliding_window, chunk_size=chunk_size,
            soft_cap=soft_cap, sm_scale=sm_scale, num_inner=num_inner, group=group,
        ),
        grid=(b, hkv, nkv, num_inner),
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, j, t: (bb, qh(hh, t), qb(t), 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, j, t: (bb, hh, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, j, t: (bb, hh, j, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bb, hh, j, t: (bb, 0, qb(t))),
            pl.BlockSpec((1, 1, block_kv), lambda bb, hh, j, t: (bb, 0, j)),
            pl.BlockSpec((1, 1, block_q), lambda bb, hh, j, t: (bb, 0, qb(t))),
            pl.BlockSpec((1, 1, block_kv), lambda bb, hh, j, t: (bb, 0, j)),
            pl.BlockSpec((1, 1, block_q, d), lambda bb, hh, j, t: (bb, qh(hh, t), qb(t), 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, hh, j, t: (bb, qh(hh, t), qb(t), 0)),
            pl.BlockSpec((1, 1, block_q, 1), lambda bb, hh, j, t: (bb, qh(hh, t), qb(t), 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, j, t: (bb, hh, j, 0)),
            pl.BlockSpec((1, 1, block_kv, d), lambda bb, hh, j, t: (bb, hh, j, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_kv, d), jnp.float32),
            pltpu.VMEM((block_kv, d), jnp.float32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hkv, skv, d), k.dtype),
            jax.ShapeDtypeStruct((b, hkv, skv, d), v.dtype),
        ],
        compiler_params=pltpu.CompilerParams(dimension_semantics=_DIMSEM),
        interpret=_should_interpret(),
    )(q, k, v, qp, kp, qs, ks, do, lse, delta)

    return dq, dk, dv, None, None, None, None


def _should_interpret() -> bool:
    return jax.default_backend() != "tpu"


# ------------------------------------------------------------- public op


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12, 13))
def flash_attention(
    q, k, v, q_pos, kv_pos, q_seg, kv_seg,
    causal=True, sliding_window=0, chunk_size=0, soft_cap=0.0,
    sm_scale=None, block_q=512, block_kv=512,
):
    """Flash attention. q:[B,H,Sq,D], k/v:[B,Hkv,Skv,D]; pos/seg [B,S] int32.

    Returns [B,H,Sq,D].
    """
    o, _ = _flash_fwd(
        q, k, v, q_pos, kv_pos, q_seg, kv_seg,
        causal, sliding_window, chunk_size, soft_cap,
        sm_scale if sm_scale is not None else 1.0 / np.sqrt(q.shape[-1]),
        block_q, block_kv,
    )
    return o


def _vjp_fwd(q, k, v, q_pos, kv_pos, q_seg, kv_seg,
             causal, sliding_window, chunk_size, soft_cap, sm_scale, block_q, block_kv):
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(q.shape[-1])
    o, lse = _flash_fwd(
        q, k, v, q_pos, kv_pos, q_seg, kv_seg,
        causal, sliding_window, chunk_size, soft_cap, scale, block_q, block_kv,
    )
    return o, (q, k, v, q_pos, kv_pos, q_seg, kv_seg, o, lse)


def _vjp_bwd(causal, sliding_window, chunk_size, soft_cap, sm_scale, block_q, block_kv,
             res, g):
    scale = sm_scale if sm_scale is not None else 1.0 / np.sqrt(res[0].shape[-1])
    return _flash_bwd(
        res, (g,), causal, sliding_window, chunk_size, soft_cap, scale, block_q, block_kv
    )


flash_attention.defvjp(_vjp_fwd, _vjp_bwd)


# ------------------------------------------------- context-parallel wrapper


def load_balanced_reorder(x: jax.Array, cp: int, axis: int = 1) -> jax.Array:
    """Reorder a sequence axis so each of ``cp`` context shards gets one chunk
    from the front and the mirrored chunk from the back: with 2*cp chunks,
    shard i receives chunks (i, 2*cp-1-i). Equal causal FLOPs per shard.
    (Reference: MaxText/max_utils.py:788 reorder_sequence.)"""
    n = 2 * cp
    chunks = jnp.split(x, n, axis=axis)
    out = []
    for i in range(cp):
        out.append(chunks[i])
        out.append(chunks[n - 1 - i])
    return jnp.concatenate(out, axis=axis)


def load_balanced_inverse(x: jax.Array, cp: int, axis: int = 1) -> jax.Array:
    """Inverse of :func:`load_balanced_reorder`."""
    n = 2 * cp
    chunks = jnp.split(x, n, axis=axis)
    out: list = [None] * n
    for i in range(cp):
        out[i] = chunks[2 * i]
        out[n - 1 - i] = chunks[2 * i + 1]
    return jnp.concatenate(out, axis=axis)


def flash_attention_sharded(
    q, k, v, segment_ids,
    mesh: Mesh | None = None,
    positions=None,
    causal=True, sliding_window=0, chunk_size=0, logits_soft_cap=0.0,
    block_q=512, block_kv=512, load_balanced=True,
    algorithm="allgather",
):
    """[B,S,N,D]-layout entry used by the Attention module.

    Under a mesh with context parallelism, shard Q's sequence axis over the
    "context" axis inside shard_map. K/V handling depends on ``algorithm``:

    - "allgather" (reference parity): K/V gathered full per device — fastest
      while the whole KV fits HBM.
    - "ring": K/V stay sequence-sharded and rotate around the context axis
      (ops/ring_attention.py) — O(S/cp) attention memory for long context.

    The caller is expected to have applied :func:`load_balanced_reorder` to
    the batch (tokens+positions+segments) when load balancing is on —
    positions passed here then make the causal mask correct without any
    in-kernel unpermutation (both algorithms; ring carries the positions
    around with the K/V blocks).
    """
    b, s, n, d = q.shape
    if positions is None:
        positions = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None, :], (b, s))
    if segment_ids is None:
        segment_ids = jnp.ones((b, s), jnp.int32)

    qh = jnp.swapaxes(q, 1, 2)
    kh = jnp.swapaxes(k, 1, 2)
    vh = jnp.swapaxes(v, 1, 2)

    cp = mesh.shape.get("context", 1) if mesh is not None else 1
    if mesh is None or mesh.devices.size == 1:
        # single device: no shard_map wrapper needed
        o = flash_attention(
            qh, kh, vh, positions, positions, segment_ids, segment_ids,
            causal, sliding_window, chunk_size, logits_soft_cap,
            None, block_q, block_kv,
        )
        return jnp.swapaxes(o, 1, 2)
    # Multi-device: the kernel must run INSIDE shard_map even with cp == 1.
    # A pallas_call is opaque to GSPMD, which replicates its operands — at
    # fsdp64 x tp4 that manifested as a 62.8 GB all-gather of the global
    # activations in the flagship v5e-256 AOT compile. The specs below
    # degenerate cleanly when an axis has size 1.
    if cp == 1 and algorithm in ("ring", "ulysses"):
        algorithm = "allgather"  # ring/ulysses are pure overhead without CP

    batch_axes = ("data", "fsdp", "fsdp_transpose", "expert")
    heads_axes = ("tensor", "tensor_transpose", "tensor_sequence")
    q_spec = P(batch_axes, heads_axes, "context", None)
    kv_spec = P(batch_axes, heads_axes, None, None)
    seq_spec = P(batch_axes, "context")
    full_seq_spec = P(batch_axes, None)

    if algorithm == "ring":
        from maxtext_indextts2_tpu.ops.ring_attention import ring_flash_attention

        kv_ring_spec = P(batch_axes, heads_axes, "context", None)

        def cp_ring(qh, kh, vh, qpos, kvpos, qseg, kvseg):
            return ring_flash_attention(
                qh, kh, vh, qpos, kvpos, qseg, kvseg,
                "context", causal, sliding_window, chunk_size, logits_soft_cap,
                None, block_q, block_kv,
            )

        o = jax.shard_map(
            cp_ring,
            mesh=mesh,
            in_specs=(q_spec, kv_ring_spec, kv_ring_spec,
                      seq_spec, seq_spec, seq_spec, seq_spec),
            out_specs=q_spec,
            check_vma=False,
        )(qh, kh, vh, positions, positions, segment_ids, segment_ids)
        return jnp.swapaxes(o, 1, 2)
    if algorithm == "ulysses":
        # DeepSpeed-Ulysses style: one all-to-all turns the sequence sharding
        # into a head sharding (every device sees the FULL sequence for H/cp
        # heads), attention runs unsharded per device, a second all-to-all
        # restores sequence sharding. Two cheap collectives; needs
        # heads % cp == 0 (per-device heads, after tensor sharding). Grads
        # flow through the native collective transposes — no custom VJP.
        tp = 1
        for ax in ("tensor", "tensor_transpose", "tensor_sequence"):
            tp *= mesh.shape.get(ax, 1)
        hq_local = q.shape[2] // tp
        h_local = max(k.shape[2] // tp, 1)
        if hq_local % cp or h_local % cp:
            raise ValueError(
                f"ulysses needs per-device query heads ({hq_local}) and kv "
                f"heads ({h_local}) divisible by context parallelism ({cp}); "
                "use context_parallel_algorithm=ring instead"
            )
        kv_uly_spec = P(batch_axes, heads_axes, "context", None)

        def cp_ulysses(qh, kh, vh, qpos, qseg):
            q_a = jax.lax.all_to_all(qh, "context", 1, 2, tiled=True)
            k_a = jax.lax.all_to_all(kh, "context", 1, 2, tiled=True)
            v_a = jax.lax.all_to_all(vh, "context", 1, 2, tiled=True)
            pos_f = jax.lax.all_gather(qpos, "context", axis=1, tiled=True)
            seg_f = jax.lax.all_gather(qseg, "context", axis=1, tiled=True)
            o = flash_attention(
                q_a, k_a, v_a, pos_f, pos_f, seg_f, seg_f,
                causal, sliding_window, chunk_size, logits_soft_cap,
                None, block_q, block_kv,
            )
            return jax.lax.all_to_all(o, "context", 2, 1, tiled=True)

        o = jax.shard_map(
            cp_ulysses,
            mesh=mesh,
            in_specs=(q_spec, kv_uly_spec, kv_uly_spec, seq_spec, seq_spec),
            out_specs=q_spec,
            check_vma=False,
        )(qh, kh, vh, positions, segment_ids)
        return jnp.swapaxes(o, 1, 2)
    if algorithm != "allgather":
        raise ValueError(f"unknown context-parallel algorithm: {algorithm!r}")

    def cp_attn(qh, kh, vh, qpos, kvpos, qseg, kvseg):
        return flash_attention(
            qh, kh, vh, qpos, kvpos, qseg, kvseg,
            causal, sliding_window, chunk_size, logits_soft_cap,
            None, block_q, block_kv,
        )

    o = jax.shard_map(
        cp_attn,
        mesh=mesh,
        in_specs=(q_spec, kv_spec, kv_spec, seq_spec, full_seq_spec, seq_spec, full_seq_spec),
        out_specs=q_spec,
        check_vma=False,
    )(qh, kh, vh, positions, positions, segment_ids, segment_ids)
    return jnp.swapaxes(o, 1, 2)
