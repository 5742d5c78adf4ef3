"""Ragged decode attention: one-token-per-slot GQA over variable lengths.

TPU-native replacement for masked full-length dot-product attention in the
autoregressive decode step (reference: MaxText/inference/
paged_attention_kernel_v2.py + jax ragged_paged_attention). Decode is
HBM-bound: with a [B, S, nkv, d] cache and slot lengths far below S, the
masked path still streams all S positions. This kernel reads only
ceil(len/block) KV blocks per slot:

- grid = (B, S // block_kv), lengths in SMEM via scalar prefetch.
- The K/V BlockSpec index maps clamp the block index to the slot's last
  valid block; Mosaic skips the HBM->VMEM copy when consecutive grid steps
  map to the same block, so out-of-range blocks cost no bandwidth.
- GQA without in-kernel transposes: q [nq, d] is pre-expanded on the host
  side of the call into [nq, nkv*d] with each head's d-slice placed at its
  kv-head offset (zeros elsewhere). Scores are then ONE dot_general against
  the flattened K block [block_kv, nkv*d]; the value product yields
  [nq, nkv*d] from which each head's d-slice is gathered outside the
  kernel. The (nkv-1)x extra MACs are noise next to the saved HBM reads.
- Online softmax with (rows, 128) sublane-aligned m/l scratch (1-D
  lane-major stats force a relayout per block; see ops/flash_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _kernel(
    lengths_ref,  # SMEM [B]
    q_ref,  # [1, nq, nkv*d]
    k_ref,  # [1, block_kv, nkv*d]
    v_ref,  # [1, block_kv, nkv*d]
    *rest,  # optional (k_scale_ref, v_scale_ref), then o_ref + scratch
    block_kv: int,
    num_blocks: int,
    scale: float,
    nkv: int,
    quantized: bool = False,
    sliding_window: int = 0,
):
    if quantized:
        k_scale_ref, v_scale_ref, o_ref, m_ref, l_ref, acc_ref = rest
    else:
        o_ref, m_ref, l_ref, acc_ref = rest
    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    def _dequant(x, scale_ref):
        # int8 [block_kv, nkv*d] * f32 per-(pos, head) scales: split the
        # fused minor dim, broadcast, re-merge (minor-dim reshapes are free)
        xs = x.astype(jnp.float32).reshape(block_kv, nkv, -1)
        return (xs * scale_ref[0][..., None]).reshape(block_kv, nkv * xs.shape[-1])

    win_start = (
        jnp.maximum(length - sliding_window, 0) if sliding_window > 0 else 0
    )

    @pl.when((j * block_kv < length) & ((j + 1) * block_kv > win_start))
    def _compute():
        q = q_ref[0]  # [nq, nkv*d]
        k = k_ref[0]  # [block_kv, nkv*d]
        if quantized:
            k = _dequant(k_ref[0], k_scale_ref).astype(q.dtype)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [nq, block_kv]

        kv_pos = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        s = jnp.where((kv_pos < length) & (kv_pos >= win_start), s, NEG_INF)

        m_prev = m_ref[:, :1]  # [nq, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [nq, block_kv]

        l_ref[...] = l_ref[...] * alpha + jnp.sum(
            p, axis=1, keepdims=True
        ) * jnp.ones_like(l_ref)
        m_ref[...] = m_new * jnp.ones_like(m_ref)

        v = v_ref[0]  # [block_kv, nkv*d]
        if quantized:
            v = _dequant(v_ref[0], v_scale_ref).astype(q.dtype)
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc_ref[...] = acc_ref[...] * alpha + pv

    @pl.when(j == num_blocks - 1)
    def _finalize():
        l = jnp.maximum(l_ref[:, :1], 1e-30)
        o_ref[0] = (acc_ref[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_kv", "interpret", "sliding_window")
)
def ragged_decode_attention(
    q: jax.Array,  # [B, nq, d]
    k: jax.Array,  # [B, S, nkv, d] (float, or int8 with k_scale)
    v: jax.Array,  # [B, S, nkv, d]
    lengths: jax.Array,  # [B] int32 valid positions per slot
    block_kv: int = 256,
    interpret: bool = False,
    k_scale: jax.Array | None = None,  # [B, S, nkv, 1] f32 (int8 KV cache)
    v_scale: jax.Array | None = None,
    sliding_window: int = 0,  # attend only the last `sliding_window` positions
) -> jax.Array:
    """Softmax(q k^T / sqrt(d)) v over each slot's first `lengths[b]` cache
    positions. Returns [B, nq, d]. With k_scale/v_scale the int8 cache is
    dequantized IN-KERNEL — the HBM stream stays int8 (2x fewer KV bytes on
    top of the ragged skipping)."""
    b_sz, nq, d = q.shape
    s_len, nkv = k.shape[1], k.shape[2]
    assert nq % nkv == 0, (nq, nkv)
    block_kv = min(block_kv, s_len)
    assert s_len % block_kv == 0, (s_len, block_kv)
    num_blocks = s_len // block_kv
    group = nq // nkv

    # GQA pre-expansion: head h -> kv head h // group; place its d-slice at
    # that kv head's offset in a [nq, nkv*d] row (zeros elsewhere).
    q_grouped = q.reshape(b_sz, nkv, group, d)
    q_exp = (
        q_grouped[:, :, None, :, :]
        * jnp.eye(nkv, dtype=q.dtype)[None, :, :, None, None]
    )  # [B, nkv, nkv, group, d]
    q_exp = q_exp.transpose(0, 2, 3, 1, 4).reshape(b_sz, nq, nkv * d)

    k_flat = k.reshape(b_sz, s_len, nkv * d)
    v_flat = v.reshape(b_sz, s_len, nkv * d)
    # clamp: a length past the cache extent would DMA out of bounds and
    # halt the device (unrecoverable for the client) — never trust callers
    lengths = jnp.minimum(lengths.astype(jnp.int32), s_len)
    quantized = k_scale is not None

    def kv_index_map(b, j, lens):
        last_valid = jnp.maximum(
            (jnp.maximum(lens[b], 1) + block_kv - 1) // block_kv - 1, 0
        )
        j = jnp.minimum(j, last_valid)
        if sliding_window > 0:
            # out-of-window leading blocks clamp to the window's first
            # block — repeated indices skip the DMA just like the tail
            first = jnp.maximum(lens[b] - sliding_window, 0) // block_kv
            j = jnp.maximum(j, jnp.minimum(first, last_valid))
        return (b, j, 0)

    in_specs = [
        pl.BlockSpec((1, nq, nkv * d), lambda b, j, lens: (b, 0, 0)),
        pl.BlockSpec((1, block_kv, nkv * d), kv_index_map),
        pl.BlockSpec((1, block_kv, nkv * d), kv_index_map),
    ]
    args = [lengths, q_exp, k_flat, v_flat]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, block_kv, nkv), kv_index_map),
            pl.BlockSpec((1, block_kv, nkv), kv_index_map),
        ]
        args += [k_scale.reshape(b_sz, s_len, nkv),
                 v_scale.reshape(b_sz, s_len, nkv)]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_sz, num_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, nq, nkv * d), lambda b, j, lens: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((nq, 128), jnp.float32),
            pltpu.VMEM((nq, 128), jnp.float32),
            pltpu.VMEM((nq, nkv * d), jnp.float32),
        ],
    )
    out_exp = pl.pallas_call(
        functools.partial(
            _kernel,
            block_kv=block_kv,
            num_blocks=num_blocks,
            scale=1.0 / (d ** 0.5),
            nkv=nkv,
            quantized=quantized,
            sliding_window=sliding_window,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (b_sz, nq, nkv * d), q.dtype if not quantized else jnp.float32
        ),
        interpret=interpret,
    )(*args)

    # gather each head's d-slice from its kv-head offset
    out = out_exp.reshape(b_sz, nkv, group, nkv, d)
    idx = jnp.arange(nkv)
    out = out[:, idx, :, idx, :]  # [nkv, B, group, d]
    return out.transpose(1, 0, 2, 3).reshape(b_sz, nq, d)


def _kernel_v2(
    lengths_ref,  # SMEM [B]
    q_ref,  # VMEM [1, nq, nkv*d]
    k_hbm,  # ANY [B, S, nkv, d] — NATIVE cache layout (a host-side reshape
    v_hbm,  # to [B, S, nkv*d] materializes the whole cache: 79% of step!)
    *rest,  # quantized: (ks_hbm, vs_hbm); then o_ref + scratch
    block_kv: int,
    scale: float,
    sliding_window: int,
    quantized: bool = False,
    group: int = 1,
):
    if quantized:
        # scales ride the regular BlockSpec pipeline as whole-slot blocks
        # ([S, nkv] f32 = 64KB at S=2048 — negligible next to the int8
        # values); manual DMA would need a 128-aligned lane dim, nkv isn't
        ks_ref, vs_ref, o_ref, k_buf, v_buf, par_ref, sem = rest
    else:
        o_ref, k_buf, v_buf, par_ref, sem = rest
    b = pl.program_id(0)
    n_slots = pl.num_programs(0)

    def slot_blocks(bb):
        length = lengths_ref[bb]
        nb = (jnp.maximum(length, 1) + block_kv - 1) // block_kv
        if sliding_window > 0:
            j0 = jnp.minimum(
                jnp.maximum(length - sliding_window, 0) // block_kv, nb - 1
            )
        else:
            j0 = jnp.int32(0)
        return length, nb, j0

    length, nb, j0 = slot_blocks(b)
    c = nb - j0  # valid blocks for this slot

    def dmas(buf, bb, j):
        return [
            pltpu.make_async_copy(
                k_hbm.at[bb, pl.ds(j * block_kv, block_kv)], k_buf.at[buf],
                sem.at[0, buf],
            ),
            pltpu.make_async_copy(
                v_hbm.at[bb, pl.ds(j * block_kv, block_kv)], v_buf.at[buf],
                sem.at[1, buf],
            ),
        ]

    # Cross-slot pipelining: each grid step issues the NEXT slot's first DMA
    # before its own compute, with buffer parity carried across steps in
    # SMEM. Without this, single-block slots (the common serving case —
    # contexts <= block_kv) serialize DMA-wait -> compute per slot with zero
    # overlap: measured 0.975 ms/layer at 128 slots x len 512 vs a 0.33 ms
    # DMA bound.
    @pl.when(b == 0)
    def _first():
        par_ref[0] = 0
        for op in dmas(0, 0, j0):
            op.start()

    p0 = par_ref[0]
    q = q_ref[0]  # [nq, nkv*d]
    nq = q.shape[0]

    def body(i, carry):
        m, l, acc = carry
        j = j0 + i
        buf = jax.lax.rem(p0 + i, 2)
        nxt = jax.lax.rem(p0 + i + 1, 2)

        @pl.when(i + 1 < c)
        def _prefetch():
            for op in dmas(nxt, b, j + 1):
                op.start()

        @pl.when((i + 1 == c) & (b + 1 < n_slots))
        def _prefetch_next_slot():
            _, _, j0n = slot_blocks(b + 1)
            for op in dmas(nxt, b + 1, j0n):
                op.start()

        for op in dmas(buf, b, j):
            op.wait()
        slot = buf  # buffer index for the compute below

        # minor-dims merge of a VMEM block is free (no relayout)
        def head_scales(sref):
            # [block_kv, nkv] f32 -> [nq, block_kv]: row r of the GQA-
            # expanded q uses kv head r//group, so scales fold into the
            # SCORE matrix (64x fewer multiplies than dequantizing the
            # [block_kv, nkv, d] values, and no 8-lane -> 128-lane
            # broadcast relayout). out[r, c] = sc[c, r // group] is built
            # by contracting a {0,1} head-selector against sc's nkv dim:
            # an explicit sc.T relayout of the narrow [block_kv, 2] block
            # crashes the Mosaic lowering at nkv=2 (caught by the round-5
            # on-chip smoke, ops/smoke.py ragged_v2_int8).
            sc = sref[0, pl.ds(j * block_kv, block_kv), :]
            nkv_ = sc.shape[1]
            row_head = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv_), 0) // group
            head_id = jax.lax.broadcasted_iota(jnp.int32, (nq, nkv_), 1)
            onehot = (row_head == head_id).astype(jnp.float32)
            return jax.lax.dot_general(
                onehot, sc, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        if quantized:
            # int8 values feed the MXU after a plain cast; the per-(pos,
            # head) scales are applied to the [nq, block_kv] scores
            k = k_buf[slot].astype(q.dtype).reshape(block_kv, -1)
        else:
            k = k_buf[slot].reshape(block_kv, -1)  # [block_kv, nkv*d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [nq, block_kv]
        if quantized:
            s = s * head_scales(ks_ref)
        kv_pos = j * block_kv + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1
        )
        valid = kv_pos < length
        if sliding_window > 0:
            valid &= kv_pos >= jnp.maximum(length - sliding_window, 0)
        s = jnp.where(valid, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)  # [nq, 1]
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        if quantized:
            # fold v scales into p (l above already summed the true p)
            p = p * head_scales(vs_ref)
            v_blk = v_buf[slot].astype(q.dtype).reshape(block_kv, -1)
        else:
            v_blk = v_buf[slot].reshape(block_kv, -1)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    d_out = q.shape[1]
    m0 = jnp.full((nq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((nq, 1), jnp.float32)
    acc0 = jnp.zeros((nq, d_out), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, c, body, (m0, l0, acc0))
    par_ref[0] = jax.lax.rem(p0 + c, 2)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("block_kv", "interpret", "sliding_window")
)
def ragged_decode_attention_v2(
    q: jax.Array,  # [B, nq, d]
    k: jax.Array,  # [B, S, nkv, d] (float, or int8 with k_scale)
    v: jax.Array,
    lengths: jax.Array,  # [B] int32
    block_kv: int = 128,
    interpret: bool = False,
    sliding_window: int = 0,
    k_scale: jax.Array | None = None,  # [B, S, nkv] f32 (int8 KV cache)
    v_scale: jax.Array | None = None,
) -> jax.Array:
    """Flash-decoding-style ragged attention: ONE grid step per slot with a
    dynamic fori_loop over only that slot's valid KV blocks, streamed from
    HBM by manual double-buffered DMAs. Unlike v1 (grid over all S/block
    blocks, ~4us of grid overhead per skipped block), invalid blocks cost
    NOTHING — neither bandwidth nor grid steps. With k_scale/v_scale the
    int8 cache is dequantized in VMEM after the DMA: decode is KV-bound, so
    halving the streamed bytes is ~the step time at large slot counts."""
    b_sz, nq, d = q.shape
    s_len, nkv = k.shape[1], k.shape[2]
    assert nq % nkv == 0, (nq, nkv)
    block_kv = min(block_kv, s_len)
    assert s_len % block_kv == 0, (s_len, block_kv)
    group = nq // nkv
    quantized = k_scale is not None

    # int8 arrays tile (4, 128) over the two minor dims: a DMA slice of an
    # int8 [B, S, nkv, d] cache needs nkv % 4 == 0 (Mosaic: "slice shape
    # along dimension 2 must be aligned to tiling (4)", caught by the
    # round-5 on-chip smoke). Serving configs keep nkv % 4 == 0 and never
    # pay this; for other head counts, zero-pad the head axis — NOTE this
    # copies the cache each call, so it is a correctness fallback, not a
    # serving path.
    nkv_pad = nkv
    if quantized and k.dtype == jnp.int8 and nkv % 4 != 0:
        nkv_pad = -(-nkv // 4) * 4
        hp = [(0, 0), (0, 0), (0, nkv_pad - nkv), (0, 0)]
        k = jnp.pad(k, hp)
        v = jnp.pad(v, hp)
        k_scale = jnp.pad(k_scale.reshape(b_sz, s_len, nkv),
                          [(0, 0), (0, 0), (0, nkv_pad - nkv)],
                          constant_values=1.0)
        v_scale = jnp.pad(v_scale.reshape(b_sz, s_len, nkv),
                          [(0, 0), (0, 0), (0, nkv_pad - nkv)],
                          constant_values=1.0)

    # GQA pre-expansion as in v1 (one dot per block, no in-kernel transpose)
    q_grouped = q.reshape(b_sz, nkv, group, d)
    q_exp = (
        q_grouped[:, :, None, :, :]
        * jnp.eye(nkv, dtype=q.dtype)[None, :, :, None, None]
    )
    q_exp = q_exp.transpose(0, 2, 3, 1, 4).reshape(b_sz, nq, nkv * d)
    if nkv_pad != nkv:
        # head h's d-slice sits at column offset h*d in both layouts; the
        # padded heads are zero columns the dots ignore
        q_exp = jnp.pad(q_exp, [(0, 0), (0, 0), (0, (nkv_pad - nkv) * d)])
    # k, v stay in their NATIVE [B, S, nkv, d] cache layout — reshaping them
    # here materializes the whole cache (measured 79% of the decode step)

    # clamp: an over-extent length would DMA past the cache and halt the
    # device (observed: serving death at pos > max_target_length, round 5)
    args = [jnp.minimum(lengths.astype(jnp.int32), s_len), q_exp, k, v]
    kv_specs = [pl.BlockSpec(memory_space=pl.ANY)] * 2
    scratch = [
        pltpu.VMEM((2, block_kv, nkv_pad, d), k.dtype),
        pltpu.VMEM((2, block_kv, nkv_pad, d), v.dtype),
    ]
    if quantized:
        # whole-slot scale blocks on the regular pipeline ([S, nkv] f32)
        args += [
            k_scale.astype(jnp.float32).reshape(b_sz, s_len, nkv_pad),
            v_scale.astype(jnp.float32).reshape(b_sz, s_len, nkv_pad),
        ]
        kv_specs += [
            pl.BlockSpec((1, s_len, nkv_pad), lambda b, lens: (b, 0, 0)),
        ] * 2
    scratch.append(pltpu.SMEM((1,), jnp.int32))  # DMA buffer parity
    scratch.append(pltpu.SemaphoreType.DMA((2, 2)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b_sz,),
        in_specs=[
            pl.BlockSpec((1, nq, nkv_pad * d), lambda b, lens: (b, 0, 0)),
            *kv_specs,
        ],
        out_specs=pl.BlockSpec((1, nq, nkv_pad * d), lambda b, lens: (b, 0, 0)),
        scratch_shapes=scratch,
    )
    out_exp = pl.pallas_call(
        functools.partial(
            _kernel_v2,
            block_kv=block_kv,
            scale=1.0 / (d ** 0.5),
            sliding_window=sliding_window,
            quantized=quantized,
            group=group,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, nq, nkv_pad * d), q.dtype),
        interpret=interpret,
        name="ragged_decode_v2",
    )(*args)

    out = out_exp.reshape(b_sz, nkv, group, nkv_pad, d)
    idx = jnp.arange(nkv)
    out = out[:, idx, :, idx, :]
    return out.transpose(1, 0, 2, 3).reshape(b_sz, nq, d)


def _kernel_paged(
    lengths_ref,  # SMEM [B]
    page_map_ref,  # SMEM [B, max_pages]
    q_ref,  # VMEM [1, nq, nkv*d]
    k_pages_hbm,  # ANY [num_pages, tpp, nkv, d]
    v_pages_hbm,
    o_ref,
    k_buf,  # VMEM [2, tpp, nkv, d]
    v_buf,
    par_ref,  # SMEM [1] DMA buffer parity
    sem,
    *,
    tpp: int,
    scale: float,
):
    """Flash-decoding over a PAGED KV cache: identical online-softmax loop to
    _kernel_v2 but each block DMA is indirected through the slot's page table
    (page_map in SMEM via scalar prefetch). One grid step per slot; invalid
    pages cost nothing."""
    b = pl.program_id(0)
    n_slots = pl.num_programs(0)

    def slot_pages(bb):
        length = lengths_ref[bb]
        return length, (jnp.maximum(length, 1) + tpp - 1) // tpp

    length, nb = slot_pages(b)

    def dmas(buf, bb, j):
        page = page_map_ref[bb, j]
        return [
            pltpu.make_async_copy(
                k_pages_hbm.at[page], k_buf.at[buf], sem.at[0, buf]
            ),
            pltpu.make_async_copy(
                v_pages_hbm.at[page], v_buf.at[buf], sem.at[1, buf]
            ),
        ]

    @pl.when(b == 0)
    def _first():
        par_ref[0] = 0
        for op in dmas(0, 0, 0):
            op.start()

    p0 = par_ref[0]
    q = q_ref[0]  # [nq, nkv*d]
    nq = q.shape[0]

    def body(i, carry):
        m, l, acc = carry
        buf = jax.lax.rem(p0 + i, 2)
        nxt = jax.lax.rem(p0 + i + 1, 2)

        @pl.when(i + 1 < nb)
        def _prefetch():
            for op in dmas(nxt, b, i + 1):
                op.start()

        @pl.when((i + 1 == nb) & (b + 1 < n_slots))
        def _prefetch_next_slot():
            for op in dmas(nxt, b + 1, 0):
                op.start()

        for op in dmas(buf, b, i):
            op.wait()

        k = k_buf[buf].reshape(tpp, -1)  # [tpp, nkv*d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # [nq, tpp]
        kv_pos = i * tpp + jax.lax.broadcasted_iota(jnp.int32, s.shape, dimension=1)
        s = jnp.where(kv_pos < length, s, NEG_INF)

        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        v_blk = v_buf[buf].reshape(tpp, -1)
        pv = jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = acc * alpha + pv
        return m_new, l, acc

    d_out = q.shape[1]
    m0 = jnp.full((nq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((nq, 1), jnp.float32)
    acc0 = jnp.zeros((nq, d_out), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, nb, body, (m0, l0, acc0))
    par_ref[0] = jax.lax.rem(p0 + nb, 2)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def paged_decode_attention_v2(
    q: jax.Array,  # [B, nq, d]
    key_pages: jax.Array,  # [num_pages, tpp, nkv, d]
    value_pages: jax.Array,
    page_map: jax.Array,  # [B, max_pages_per_slot] int32
    lengths: jax.Array,  # [B] int32 (valid tokens per slot)
    interpret: bool = False,
) -> jax.Array:
    """Flash-decoding attention over a paged KV cache (reference capability:
    MaxText/inference/paged_attention_kernel_v2.py:18-27, redesigned as the
    v2 per-slot dynamic loop with page-table indirection). Cost scales with
    each slot's VALID length — independent of both max context and the page
    pool size — while the cache itself is allocated page-by-page, so the HBM
    footprint scales with live tokens instead of slots x max_context."""
    b_sz, nq, d = q.shape
    num_pages, tpp, nkv, _ = key_pages.shape
    assert nq % nkv == 0, (nq, nkv)
    group = nq // nkv

    # GQA pre-expansion as in v1/v2 (one dot per block, no in-kernel transpose)
    q_grouped = q.reshape(b_sz, nkv, group, d)
    q_exp = (
        q_grouped[:, :, None, :, :]
        * jnp.eye(nkv, dtype=q.dtype)[None, :, :, None, None]
    )
    q_exp = q_exp.transpose(0, 2, 3, 1, 4).reshape(b_sz, nq, nkv * d)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # lengths, page_map
        grid=(b_sz,),
        in_specs=[
            pl.BlockSpec((1, nq, nkv * d), lambda b, lens, pm: (b, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((1, nq, nkv * d), lambda b, lens, pm: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, tpp, nkv, d), key_pages.dtype),
            pltpu.VMEM((2, tpp, nkv, d), value_pages.dtype),
            pltpu.SMEM((1,), jnp.int32),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    out_exp = pl.pallas_call(
        functools.partial(_kernel_paged, tpp=tpp, scale=1.0 / (d ** 0.5)),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, nq, nkv * d), q.dtype),
        interpret=interpret,
        name="paged_decode_v2",
    )(jnp.minimum(lengths.astype(jnp.int32), tpp * page_map.shape[1]),
      page_map.astype(jnp.int32), q_exp,
      key_pages, value_pages)

    out = out_exp.reshape(b_sz, nkv, group, nkv, d)
    idx = jnp.arange(nkv)
    out = out[:, idx, :, idx, :]
    return out.transpose(1, 0, 2, 3).reshape(b_sz, nq, d)


def ragged_decode_attention_reference(q, k, v, lengths, sliding_window: int = 0):
    """jnp reference for tests: masked full-length attention."""
    b_sz, nq, d = q.shape
    s_len, nkv = k.shape[1], k.shape[2]
    group = nq // nkv
    qg = q.reshape(b_sz, nkv, group, d)
    s = jnp.einsum("bhgd,bshd->bhgs", qg, k) / (d ** 0.5)
    mask = jnp.arange(s_len)[None, :] < lengths[:, None]  # [B, S]
    if sliding_window > 0:
        mask &= jnp.arange(s_len)[None, :] >= jnp.maximum(
            lengths[:, None] - sliding_window, 0
        )
    s = jnp.where(mask[:, None, None, :], s, -jnp.inf)
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhgs,bshd->bhgd", p.astype(v.dtype), v)
    return o.reshape(b_sz, nq, d)
