"""Attention: projections, RoPE, mask generation, kernel dispatch, KV cache.

TPU-native redesign of the reference attention stack
(MaxText/layers/attentions.py:340 AttentionOp, :1622 Attention). One
configurable module covers MHA/GQA/MQA, global/sliding-window/chunked causal
attention, logit softcaps, and train/prefill/autoregressive modes.

Kernel dispatch:
- ``dot_product``: XLA einsum attention (fused by Mosaic/XLA); used for short
  sequences and decode.
- ``flash``: Pallas block-sparse flash kernel (ops/flash_attention.py) with
  context-parallel Q sharding via shard_map; used for long-sequence training.

The KV cache is a flax "cache" variable collection: a single [B, S_max]
ring-free buffer written at [0, prefill_len) by prefill and one slot per
decode step — simpler than the reference's split prefill/AR caches while
keeping full-sequence layout for paged/ragged kernels to slice.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from maxtext_indextts2_tpu.models import rope as rope_lib
from maxtext_indextts2_tpu.models.layers import DenseGeneral, RMSNorm, nd_dense_init
from maxtext_indextts2_tpu.parallel.sharding import shard

# Large negative for masked logits (matches flash kernel's mask value).
DEFAULT_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)

MODE_TRAIN = "train"
MODE_PREFILL = "prefill"
MODE_AUTOREGRESSIVE = "autoregressive"
# Speculative-decoding verify pass: score K draft tokens per slot in one
# forward. KV is written at [pos, pos+K) per slot but cache_index is NOT
# advanced — the engine sets it to pos + accepted + 1 after acceptance
# (stale entries beyond the index are overwritten by later writes and never
# read, since all decode masks bound reads by cache_index/positions).
MODE_VERIFY = "verify"


def make_attention_mask(
    q_positions: jax.Array,  # [B, Sq]
    kv_positions: jax.Array,  # [B, Skv]
    q_segment_ids: jax.Array | None,  # [B, Sq]
    kv_segment_ids: jax.Array | None,  # [B, Skv]
    causal: bool = True,
    sliding_window: int = 0,
    chunk_size: int = 0,
) -> jax.Array:
    """Boolean [B, 1, Sq, Skv] mask (True = attend)."""
    qp = q_positions[:, :, None]
    kp = kv_positions[:, None, :]
    mask = jnp.ones(qp.shape[:1] + (qp.shape[1], kp.shape[2]), dtype=jnp.bool_)
    if causal:
        mask &= kp <= qp
    if sliding_window > 0:
        mask &= kp > qp - sliding_window
    if chunk_size > 0:
        mask &= (qp // chunk_size) == (kp // chunk_size)
    if q_segment_ids is not None and kv_segment_ids is not None:
        mask &= q_segment_ids[:, :, None] == kv_segment_ids[:, None, :]
    return mask[:, None, :, :]


def dot_product_attention(
    q: jax.Array,  # [B, Sq, Nq, D]
    k: jax.Array,  # [B, Skv, Nkv, D]
    v: jax.Array,  # [B, Skv, Nkv, D]
    mask: jax.Array | None,  # [B, 1, Sq, Skv] bool
    logits_soft_cap: float = 0.0,
    float32_qk: bool = True,
) -> jax.Array:
    """Grouped-query einsum attention with f32 softmax."""
    b, sq, nq, d = q.shape
    nkv = k.shape[2]
    group = nq // nkv
    q = q.reshape(b, sq, nkv, group, d)

    qk_dtype = jnp.float32 if float32_qk else q.dtype
    logits = jnp.einsum(
        "bqhgd,bkhd->bhgqk",
        q.astype(qk_dtype),
        k.astype(qk_dtype),
        preferred_element_type=jnp.float32,
    )
    logits = logits / np.sqrt(d)
    if logits_soft_cap > 0.0:
        logits = logits_soft_cap * jnp.tanh(logits / logits_soft_cap)
    if mask is not None:
        logits = jnp.where(mask[:, :, None, :, :], logits, DEFAULT_MASK_VALUE)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhgqk,bkhd->bqhgd", probs, v, preferred_element_type=jnp.float32)
    return out.reshape(b, sq, nq, v.shape[-1]).astype(v.dtype)  # v head dim may differ (MLA)


def _row_update(cache, rows, idx):
    """Write ``rows [B,K,...]`` at ``cache[b, idx[b]:idx[b]+K]`` touching only
    those rows (Pallas aliased kernel on TPU; jnp scatter elsewhere). The
    scatter fallback rewrites the whole buffer — fine for tests, ruinous for
    serving (see ops/inplace_update.py)."""
    if jax.default_backend() == "tpu":
        from maxtext_indextts2_tpu.ops.inplace_update import inplace_row_update

        return inplace_row_update(cache, rows, idx)
    b, span = rows.shape[0], rows.shape[1]
    offs = jnp.minimum(
        idx[:, None] + jnp.arange(span, dtype=jnp.int32)[None, :],
        cache.shape[1] - 1,
    )
    return cache.at[jnp.arange(b)[:, None], offs].set(rows.astype(cache.dtype))


class KVCache(nn.Module):
    """Decode KV cache as flax "cache" variables: full-length buffers plus a
    scalar write index. Prefill fills [0, prefill_len); each AR step writes
    one slot. (Reference: MaxText/inference/kvcache.py:233.)"""

    max_length: int
    num_kv_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16
    quantize: bool = False  # int8 values + per-(pos,head) f32 scales

    @nn.compact
    def update(self, k: jax.Array, v: jax.Array, mode: str, true_lengths=None,
               cache_offset=None):
        """true_lengths: [B] int32 — actual prompt length per row in prefill
        (defaults to the full prefill width). cache_index is per-slot so a
        continuous-batching engine can hold slots at different positions.
        cache_offset: scalar — chunked prefill writes this chunk at
        [offset, offset+len) on top of the existing cache (reference:
        maxengine.py ExistingPrefix chunked prefill)."""
        b = k.shape[0]
        shape = (b, self.max_length, self.num_kv_heads, self.head_dim)
        store_dtype = jnp.int8 if self.quantize else self.dtype
        ck = self.variable("cache", "cached_key", jnp.zeros, shape, store_dtype)
        cv = self.variable("cache", "cached_value", jnp.zeros, shape, store_dtype)
        idx = self.variable("cache", "cache_index", jnp.zeros, (b,), jnp.int32)
        seg = self.variable(
            "cache", "cached_segment_ids", jnp.zeros, (b, self.max_length), jnp.int32
        )
        if self.quantize:
            from maxtext_indextts2_tpu.ops.quantization import dequantize_kv, quantize_kv

            # [B, S, nkv] — NO trailing 1: a size-1 lane dim is tile-padded
            # to 128 lanes (1GB of HBM per scale buffer at 128 slots)
            sshape = (b, self.max_length, self.num_kv_heads)
            ck_s = self.variable("cache", "key_scale", jnp.ones, sshape, jnp.float32)
            cv_s = self.variable("cache", "value_scale", jnp.ones, sshape, jnp.float32)
            k, k_scale = quantize_kv(k)
            v, v_scale = quantize_kv(v)

        if mode == MODE_PREFILL:
            prefill_len = k.shape[1]
            if true_lengths is None:
                true_lengths = jnp.full((b,), prefill_len, jnp.int32)
            off = jnp.asarray(0 if cache_offset is None else cache_offset, jnp.int32)
            ck.value = jax.lax.dynamic_update_slice(
                ck.value, k.astype(store_dtype), (0, off, 0, 0))
            cv.value = jax.lax.dynamic_update_slice(
                cv.value, v.astype(store_dtype), (0, off, 0, 0))
            if self.quantize:
                ck_s.value = jax.lax.dynamic_update_slice(ck_s.value, k_scale, (0, off, 0))
                cv_s.value = jax.lax.dynamic_update_slice(cv_s.value, v_scale, (0, off, 0))
            end = off + true_lengths[:, None]
            # [0, off) was validated by earlier chunks; arange < end covers it
            seg.value = (
                jnp.arange(self.max_length, dtype=jnp.int32)[None, :] < end
            ).astype(jnp.int32)
            idx.value = (off + true_lengths).astype(jnp.int32)
        elif mode == MODE_VERIFY:
            # k,v are [B, K, N, D]: write the whole draft span at per-slot
            # offsets WITHOUT advancing cache_index (see MODE_VERIFY note).
            span = k.shape[1]
            rows = jnp.arange(b)[:, None]
            offs = idx.value[:, None] + jnp.arange(span, dtype=jnp.int32)[None, :]
            offs = jnp.minimum(offs, self.max_length - 1)
            ck.value = _row_update(ck.value, k, idx.value)
            cv.value = _row_update(cv.value, v, idx.value)
            if self.quantize:
                ck_s.value = _row_update(ck_s.value, k_scale, idx.value)
                cv_s.value = _row_update(cv_s.value, v_scale, idx.value)
            seg.value = seg.value.at[rows, offs].set(1)
        else:  # autoregressive: k,v are [B, 1, N, D]; per-slot write position
            pos = idx.value  # [B]
            rows = jnp.arange(b)
            ck.value = _row_update(ck.value, k, pos)
            cv.value = _row_update(cv.value, v, pos)
            if self.quantize:
                ck_s.value = _row_update(ck_s.value, k_scale, pos)
                cv_s.value = _row_update(cv_s.value, v_scale, pos)
            seg.value = seg.value.at[rows, pos].set(1)
            idx.value = pos + 1

        ck.value = shard(ck.value, "cache_batch", "cache_sequence", "cache_heads", "cache_kv")
        cv.value = shard(cv.value, "cache_batch", "cache_sequence", "cache_heads", "cache_kv")
        if self.quantize:
            # raw int8 + scales: the ragged decode kernel dequantizes
            # in-kernel so the HBM stream stays int8; other paths
            # dequantize at the use site.
            return ck.value, cv.value, seg.value, idx.value, (ck_s.value, cv_s.value)
        return ck.value, cv.value, seg.value, idx.value, None


class PagedKVCacheVars(nn.Module):
    """Paged decode KV cache as flax "cache" variables: a shared page pool
    [num_pages, tokens_per_page, nkv, d] per layer, indexed by the engine's
    PageState (page_map/seq_lens live OUTSIDE the cache — one table serves
    every layer). Instantiated under the same ``kv_cache`` scope name as the
    dense KVCache so engine insert can walk aligned paths.
    (Reference: MaxText/inference/paged_attention.py PagedAttentionOp:99.)"""

    num_pages: int
    tokens_per_page: int
    num_kv_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def update(self, k: jax.Array, v: jax.Array, page_state):
        """k,v: [num_slots, 1, nkv, d] — write each active slot's new token at
        seq_lens-1 (the engine advances seq_lens via allocate_decode_step
        BEFORE the model call). Returns (key_pages, value_pages)."""
        from maxtext_indextts2_tpu.infer.paged_attention import (
            PagedKVCache,
            write_decode_step,
        )

        shape = (self.num_pages, self.tokens_per_page, self.num_kv_heads, self.head_dim)
        kp = self.variable("cache", "key_pages", jnp.zeros, shape, self.dtype)
        vp = self.variable("cache", "value_pages", jnp.zeros, shape, self.dtype)
        cache = write_decode_step(PagedKVCache(kp.value, vp.value), page_state, k, v)
        kp.value, vp.value = cache.key_pages, cache.value_pages
        return cache


class Attention(nn.Module):
    """Multi-head attention with RoPE and cached decode."""

    num_query_heads: int
    num_kv_heads: int
    head_dim: int
    max_target_length: int = 2048
    attention_kernel: str = "autoselected"  # autoselected|dot_product|flash
    decode_attention: str = "dot_product"  # dot_product | bucketed | ragged
    dtype: jnp.dtype = jnp.bfloat16
    weight_dtype: jnp.dtype = jnp.float32
    float32_qk_product: bool = False
    attn_logits_soft_cap: float = 0.0
    sliding_window_size: int = 0
    chunk_attn_window_size: int = 0
    rope_type: str = "default"
    rope_interleave: bool = False  # llama4/deepseek complex-pair rotation
    rope_max_timescale: float = 10_000.0
    rope_factor: float = 8.0
    rope_low_freq_factor: float = 1.0
    rope_high_freq_factor: float = 4.0
    rope_original_max_position: int = 8192
    use_qk_norm: bool = False  # qwen3/gemma3-style per-head q/k RMSNorm
    qk_norm_scale_plus_one: bool = False  # gemma convention for the qk norms
    qk_norm_type: str = "rms"  # rms (learned, pre-rope) | l2 (param-free, post-rope; llama4)
    use_temperature_tuning: bool = False  # llama4 NoPE-layer q scaling
    attn_temperature_scale: float = 0.1  # llama4 attn_scale
    attn_temperature_floor_scale: float = 8192.0  # llama4 floor_scale
    query_pre_attn_scalar: float | None = None  # gemma: scale q by this instead of 1/sqrt(d)
    normalization_layer_epsilon: float = 1e-6
    use_bias: bool = False
    kernel_init: Any = nd_dense_init()
    matmul_precision: str = "default"
    quantization: str = ""
    quantize_kvcache: bool = False
    lora_rank: int = 0  # applied to q/v projections (classic LoRA targets)
    flash_block_sizes: tuple[int, int] = (512, 512)
    context_parallelism: int = 1
    load_balanced_context_parallel: bool = True
    context_parallel_algorithm: str = "allgather"  # | "ring"
    # Paged KV cache (reference: MaxText/inference/paged_attention.py:99).
    # Decode KV lives in a shared [num_pages, tokens_per_page] pool instead
    # of per-slot [B, max_target_length] buffers: HBM scales with LIVE tokens,
    # so long-context serving fits where the dense cache cannot allocate.
    paged_attention: bool = False
    pagedattn_num_pages: int = 64
    pagedattn_tokens_per_page: int = 32
    mesh: Any = None

    @nn.compact
    def __call__(
        self,
        inputs_q: jax.Array,  # [B, S, E]
        inputs_kv: jax.Array,
        positions: jax.Array,  # [B, S]
        segment_ids: jax.Array | None,
        mode: str = MODE_TRAIN,
        deterministic: bool = True,
        cache_offset=None,  # chunked prefill: this chunk's global start
        page_state=None,  # paged decode: infer.page_manager.PageState
    ) -> jax.Array:
        q = DenseGeneral(
            features=(self.num_query_heads, self.head_dim),
            kernel_axes=("embed", "q_heads", "kv_head_dim"),
            dtype=self.dtype,
            weight_dtype=self.weight_dtype,
            use_bias=self.use_bias,
            matmul_precision=self.matmul_precision,
            quantization=self.quantization,
            lora_rank=self.lora_rank,
            name="query",
        )(inputs_q)
        k = DenseGeneral(
            features=(self.num_kv_heads, self.head_dim),
            kernel_axes=("embed", "kv_heads", "kv_head_dim"),
            dtype=self.dtype,
            weight_dtype=self.weight_dtype,
            use_bias=self.use_bias,
            matmul_precision=self.matmul_precision,
            quantization=self.quantization,
            name="key",
        )(inputs_kv)
        v = DenseGeneral(
            features=(self.num_kv_heads, self.head_dim),
            kernel_axes=("embed", "kv_heads", "kv_head_dim"),
            dtype=self.dtype,
            weight_dtype=self.weight_dtype,
            use_bias=self.use_bias,
            matmul_precision=self.matmul_precision,
            quantization=self.quantization,
            lora_rank=self.lora_rank,
            name="value",
        )(inputs_kv)

        if self.use_qk_norm and self.qk_norm_type == "rms":
            qk_norm = RMSNorm(
                epsilon=self.normalization_layer_epsilon,
                dtype=self.dtype,
                weight_dtype=self.weight_dtype,
                kernel_axes=("kv_head_dim",),
                scale_plus_one=self.qk_norm_scale_plus_one,
                name="query_norm",
            )
            q = qk_norm(q)
            k = RMSNorm(
                epsilon=self.normalization_layer_epsilon,
                dtype=self.dtype,
                weight_dtype=self.weight_dtype,
                kernel_axes=("kv_head_dim",),
                scale_plus_one=self.qk_norm_scale_plus_one,
                name="key_norm",
            )(k)

        if self.rope_type != "none":
            inv_freq = rope_frequencies_cached(
                self.head_dim,
                self.rope_type,
                self.rope_max_timescale,
                self.rope_factor,
                self.rope_low_freq_factor,
                self.rope_high_freq_factor,
                self.rope_original_max_position,
            )
            q = rope_lib.apply_rope(q, positions, inv_freq, interleave=self.rope_interleave)
            k = rope_lib.apply_rope(k, positions, inv_freq, interleave=self.rope_interleave)

        if self.use_qk_norm and self.qk_norm_type == "l2":
            # llama4: parameter-free L2 (rms without scale) applied AFTER
            # rope (reference HF Llama4TextL2Norm; modeling_llama4.py:97).
            def _l2(x):
                x32 = x.astype(jnp.float32)
                return (x32 * jax.lax.rsqrt(
                    jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
                    + self.normalization_layer_epsilon)).astype(x.dtype)

            q = _l2(q)
            k = _l2(k)

        if self.use_temperature_tuning:
            # llama4 NoPE layers: scale q by log1p(floor((pos+1)/floor)) *
            # attn_scale + 1 (arXiv:2501.19399; HF modeling_llama4.py:338).
            scales = (
                jnp.log1p(
                    jnp.floor((positions.astype(jnp.float32) + 1.0)
                              / self.attn_temperature_floor_scale)
                ) * self.attn_temperature_scale + 1.0
            )
            q = q * scales[..., None, None].astype(q.dtype)

        if self.query_pre_attn_scalar is not None:
            # gemma semantics: scores = qk / sqrt(query_pre_attn_scalar).
            # Fold into q, compensating the kernel's 1/sqrt(head_dim).
            q = q * (np.sqrt(self.head_dim) / np.sqrt(self.query_pre_attn_scalar))

        q = shard(q, "activation_batch", "activation_length", "activation_heads", "activation_kv_head_dim")
        k = shard(k, "activation_kv_batch", "activation_length", "activation_kv_heads", "activation_kv_head_dim")
        v = shard(v, "activation_kv_batch", "activation_length", "activation_kv_heads", "activation_kv_head_dim")

        if mode == MODE_TRAIN:
            out = self._train_attention(q, k, v, positions, segment_ids)
            out = out.astype(self.dtype)
        elif mode == MODE_AUTOREGRESSIVE and self.paged_attention:
            assert page_state is not None, "paged decode needs a PageState"
            assert self.sliding_window_size == 0 and self.chunk_attn_window_size == 0, (
                "paged decode supports global causal attention only"
            )
            cache = PagedKVCacheVars(
                num_pages=self.pagedattn_num_pages,
                tokens_per_page=self.pagedattn_tokens_per_page,
                num_kv_heads=self.num_kv_heads,
                head_dim=self.head_dim,
                dtype=self.dtype,
                name="kv_cache",
            ).update(k, v, page_state)
            if jax.default_backend() == "tpu" and self.attn_logits_soft_cap == 0.0:
                from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
                    paged_decode_attention_v2,
                )

                out = paged_decode_attention_v2(
                    q[:, 0], cache.key_pages, cache.value_pages,
                    page_state.page_map, page_state.seq_lens,
                )[:, None].astype(self.dtype)
            else:
                from maxtext_indextts2_tpu.infer.paged_attention import (
                    paged_decode_attention,
                )

                out = paged_decode_attention(
                    q, cache, page_state, self.attn_logits_soft_cap
                ).astype(self.dtype)
        else:
            cache = KVCache(
                max_length=self.max_target_length,
                num_kv_heads=self.num_kv_heads,
                head_dim=self.head_dim,
                dtype=self.dtype,
                quantize=self.quantize_kvcache,
                name="kv_cache",
            )
            true_lengths = None
            if mode == MODE_PREFILL and segment_ids is not None:
                true_lengths = jnp.sum((segment_ids != 0).astype(jnp.int32), axis=1)
            ck, cv, cseg, cidx, kv_scales = cache.update(
                k, v, mode, true_lengths, cache_offset
            )

            def _dequant_cache():
                if kv_scales is None:
                    return ck, cv
                from maxtext_indextts2_tpu.ops.quantization import dequantize_kv

                return (dequantize_kv(ck, kv_scales[0], self.dtype),
                        dequantize_kv(cv, kv_scales[1], self.dtype))
            if mode == MODE_PREFILL and cache_offset is not None:
                # chunked prefill: attend over everything cached so far,
                # causal against this chunk's GLOBAL positions
                kv_positions = jnp.broadcast_to(
                    jnp.arange(self.max_target_length, dtype=jnp.int32)[None, :],
                    (q.shape[0], self.max_target_length),
                )
                mask = (kv_positions[:, None, :] <= positions[:, :, None]) & (
                    cseg[:, None, :] > 0
                )
                if self.sliding_window_size > 0:
                    mask &= kv_positions[:, None, :] > (
                        positions[:, :, None] - self.sliding_window_size
                    )
                if self.chunk_attn_window_size > 0:
                    mask &= (
                        kv_positions[:, None, :] // self.chunk_attn_window_size
                        == positions[:, :, None] // self.chunk_attn_window_size
                    )
                dk, dv = _dequant_cache()
                out = dot_product_attention(
                    q, dk, dv, mask[:, None, :, :],
                    self.attn_logits_soft_cap, self.float32_qk_product,
                )
            elif mode == MODE_PREFILL:
                # attend only within the prefill segment
                mask = make_attention_mask(
                    positions,
                    positions,
                    segment_ids,
                    segment_ids,
                    causal=True,
                    sliding_window=self.sliding_window_size,
                    chunk_size=self.chunk_attn_window_size,
                )
                out = dot_product_attention(
                    q, k, v, mask, self.attn_logits_soft_cap, self.float32_qk_product
                )
            elif mode == MODE_VERIFY:
                # score K drafts against the full cache; [0, pos) holds the
                # committed stream, [pos, q_pos] was just written above.
                kv_positions = jnp.broadcast_to(
                    jnp.arange(self.max_target_length, dtype=jnp.int32)[None, :],
                    (q.shape[0], self.max_target_length),
                )
                mask = kv_positions[:, None, :] <= positions[:, :, None]
                if self.sliding_window_size > 0:
                    mask &= kv_positions[:, None, :] > (
                        positions[:, :, None] - self.sliding_window_size
                    )
                if self.chunk_attn_window_size > 0:
                    mask &= (
                        kv_positions[:, None, :] // self.chunk_attn_window_size
                        == positions[:, :, None] // self.chunk_attn_window_size
                    )
                dk, dv = _dequant_cache()
                out = dot_product_attention(
                    q, dk, dv, mask[:, None, :, :],
                    self.attn_logits_soft_cap, self.float32_qk_product,
                )
            elif (
                self.decode_attention == "ragged"
                and self.chunk_attn_window_size == 0
                and self.attn_logits_soft_cap == 0.0
            ):
                # Pallas ragged decode: reads only each slot's valid KV
                # blocks (positions < cidx always hold real tokens — padded
                # prefill garbage is overwritten before cidx passes it).
                # The v2 flash-decoding kernel (per-slot dynamic block loop
                # + manual double-buffered DMAs — cost independent of
                # max_target_length) serves float AND int8 caches; int8 is
                # dequantized in VMEM so the HBM stream stays int8 (2x fewer
                # KV bytes on the KV-bound decode step).
                from maxtext_indextts2_tpu.ops.ragged_decode_attention import (
                    ragged_decode_attention_v2,
                )

                interp = jax.default_backend() != "tpu"
                scales = kv_scales or (None, None)
                out = ragged_decode_attention_v2(
                    q[:, 0], ck, cv, cidx, interpret=interp,
                    sliding_window=self.sliding_window_size,
                    k_scale=scales[0], v_scale=scales[1],
                ).astype(q.dtype)[:, None]
            elif self.decode_attention == "bucketed":
                # Read only the smallest power-of-two KV prefix that covers
                # every slot (lax.switch over static slices). Decode is
                # KV-bound; XLA's masked attention already streams at
                # ~960GB/s on v5e but reads ALL max_target_length positions
                # — this reads ceil(max(cidx)) -> S/max_len x less traffic,
                # with none of a custom kernel's per-block overhead.
                def branch(width):
                    def f():
                        k_w = jax.lax.slice_in_dim(ck, 0, width, axis=1)
                        v_w = jax.lax.slice_in_dim(cv, 0, width, axis=1)
                        if kv_scales is not None:
                            from maxtext_indextts2_tpu.ops.quantization import (
                                dequantize_kv,
                            )

                            k_w = dequantize_kv(
                                k_w,
                                jax.lax.slice_in_dim(kv_scales[0], 0, width, axis=1),
                                self.dtype,
                            )
                            v_w = dequantize_kv(
                                v_w,
                                jax.lax.slice_in_dim(kv_scales[1], 0, width, axis=1),
                                self.dtype,
                            )
                        kv_positions = jnp.broadcast_to(
                            jnp.arange(width, dtype=jnp.int32)[None, :],
                            (q.shape[0], width),
                        )
                        nxt = cidx[:, None]
                        valid = kv_positions < nxt
                        if self.sliding_window_size > 0:
                            valid &= kv_positions > (nxt - 1) - self.sliding_window_size
                        if self.chunk_attn_window_size > 0:
                            valid &= (
                                kv_positions // self.chunk_attn_window_size
                            ) == ((nxt - 1) // self.chunk_attn_window_size)
                        valid &= jax.lax.slice_in_dim(cseg, 0, width, axis=1) > 0
                        return dot_product_attention(
                            q, k_w, v_w, valid[:, None, None, :],
                            self.attn_logits_soft_cap, self.float32_qk_product,
                        )

                    return f

                widths = [256]
                while widths[-1] < self.max_target_length:
                    widths.append(min(widths[-1] * 2, self.max_target_length))
                max_len = jnp.max(cidx)
                which = jnp.searchsorted(
                    jnp.asarray(widths, jnp.int32), max_len, side="left"
                )
                out = jax.lax.switch(which, [branch(w) for w in widths])
            else:
                kv_positions = jnp.broadcast_to(
                    jnp.arange(self.max_target_length, dtype=jnp.int32)[None, :],
                    (q.shape[0], self.max_target_length),
                )
                nxt = cidx[:, None]  # [B,1] next write position; query sits at nxt-1
                valid = kv_positions < nxt
                if self.sliding_window_size > 0:
                    valid &= kv_positions > (nxt - 1) - self.sliding_window_size
                if self.chunk_attn_window_size > 0:
                    valid &= (kv_positions // self.chunk_attn_window_size) == (
                        (nxt - 1) // self.chunk_attn_window_size
                    )
                valid &= cseg > 0
                mask = valid[:, None, None, :]
                dk, dv = _dequant_cache()
                out = dot_product_attention(
                    q, dk, dv, mask, self.attn_logits_soft_cap, self.float32_qk_product
                )

        out = shard(out, "activation_batch", "activation_length", "activation_heads", "activation_kv_head_dim")
        # remat anchor: saving this (64 MB/layer at 1B/batch-8) lets the
        # backward skip recomputing qkv projections + the flash fwd kernel
        # (policy save_attn_out in models/decoder.py)
        out = checkpoint_name(out, "attn_out")
        return DenseGeneral(
            features=inputs_q.shape[-1],
            axis=(-2, -1),
            kernel_axes=("heads", "kv_head_dim", "embed"),
            dtype=self.dtype,
            weight_dtype=self.weight_dtype,
            use_bias=self.use_bias,
            matmul_precision=self.matmul_precision,
            quantization=self.quantization,
            name="out",
        )(out)

    def _train_attention(self, q, k, v, positions, segment_ids):
        kernel = self.attention_kernel
        if kernel == "autoselected":
            on_tpu = jax.devices()[0].platform == "tpu"
            kernel = "flash" if (on_tpu and q.shape[1] >= 1024) else "dot_product"
        if kernel == "flash":
            from maxtext_indextts2_tpu.ops.flash_attention import flash_attention_sharded

            return flash_attention_sharded(
                q,
                k,
                v,
                segment_ids,
                mesh=self.mesh,
                positions=positions,
                causal=True,
                sliding_window=self.sliding_window_size,
                chunk_size=self.chunk_attn_window_size,
                logits_soft_cap=self.attn_logits_soft_cap,
                block_q=self.flash_block_sizes[0],
                block_kv=self.flash_block_sizes[1],
                load_balanced=self.load_balanced_context_parallel,
                algorithm=self.context_parallel_algorithm,
            )
        mask = make_attention_mask(
            positions,
            positions,
            segment_ids,
            segment_ids,
            causal=True,
            sliding_window=self.sliding_window_size,
            chunk_size=self.chunk_attn_window_size,
        )
        return dot_product_attention(
            q, k, v, mask, self.attn_logits_soft_cap, self.float32_qk_product
        )


_FREQ_CACHE: dict = {}


def rope_frequencies_cached(head_dim, rope_type, max_timescale, factor, low, high, orig):
    key = (head_dim, rope_type, max_timescale, factor, low, high, orig)
    if key not in _FREQ_CACHE:
        _FREQ_CACHE[key] = rope_lib.rope_frequencies(
            head_dim, rope_type, max_timescale, factor, low, high, orig
        )
    return _FREQ_CACHE[key]
