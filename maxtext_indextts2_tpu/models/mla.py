"""Multi-head Latent Attention (DeepSeek V2/V3).

Reference: MaxText/layers/attentions.py:2469 MLA. Queries and KV are
projected through low-rank latents; the RoPE part of the key is a single
shared head. Decode caches the *compressed* latent (c_kv + k_pe) — the whole
point of MLA — and expands per step (reference: inference/kvcache.py:899
MlaKVCache).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.models import rope as rope_lib
from maxtext_indextts2_tpu.models.attention import (
    MODE_AUTOREGRESSIVE,
    MODE_PREFILL,
    MODE_TRAIN,
    MODE_VERIFY,
    _row_update,
    dot_product_attention,
    make_attention_mask,
)
from maxtext_indextts2_tpu.models.layers import DenseGeneral, RMSNorm
from maxtext_indextts2_tpu.parallel.sharding import shard


class MLAttention(nn.Module):
    cfg: Config
    mesh: Any = None

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,  # [B,S,E]
        positions: jax.Array,
        segment_ids: jax.Array | None,
        mode: str = MODE_TRAIN,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        wdt = jnp.dtype(cfg.weight_dtype)
        n = cfg.num_query_heads
        d_nope, d_rope, d_v = cfg.qk_nope_head_dim, cfg.qk_rope_head_dim, cfg.v_head_dim
        d_qk = d_nope + d_rope

        common = dict(dtype=dtype, weight_dtype=wdt, matmul_precision=cfg.matmul_precision)
        norm = lambda name: RMSNorm(
            epsilon=cfg.normalization_layer_epsilon, dtype=dtype, weight_dtype=wdt, name=name
        )

        # ---- queries
        if cfg.q_lora_rank > 0:
            q_c = DenseGeneral(cfg.q_lora_rank, kernel_axes=("embed", "q_lora"),
                               name="wq_a", **common)(inputs)
            q_c = norm("q_norm")(q_c)
            q = DenseGeneral((n, d_qk), kernel_axes=("q_lora", "q_heads", "kv_head_dim"),
                             name="wq_b", **common)(q_c)
        else:
            q = DenseGeneral((n, d_qk), kernel_axes=("embed", "q_heads", "kv_head_dim"),
                             name="wq", **common)(inputs)

        # ---- compressed kv latent + shared rope key
        kv_a = DenseGeneral(cfg.kv_lora_rank + d_rope, kernel_axes=("embed", "kv_lora"),
                            name="wkv_a", **common)(inputs)
        c_kv, k_pe = kv_a[..., : cfg.kv_lora_rank], kv_a[..., cfg.kv_lora_rank:]
        c_kv = norm("kv_norm")(c_kv)

        inv_freq = rope_lib.rope_frequencies(
            d_rope, cfg.rope_type if cfg.rope_type != "none" else "default",
            cfg.rope_max_timescale, cfg.rope_factor,
            cfg.rope_low_freq_factor, cfg.rope_high_freq_factor,
            cfg.rope_original_max_position,
        )
        q_nope, q_pe = q[..., :d_nope], q[..., d_nope:]
        q_pe = rope_lib.apply_rope(q_pe, positions, inv_freq, interleave=True)
        k_pe = rope_lib.apply_rope(k_pe, positions, inv_freq, interleave=True)

        if mode in (MODE_PREFILL, MODE_AUTOREGRESSIVE, MODE_VERIFY):
            c_kv, k_pe, cached_len, valid = self._latent_cache(
                c_kv, k_pe, mode, segment_ids
            )
            kv_positions = jnp.broadcast_to(
                jnp.arange(c_kv.shape[1], dtype=jnp.int32)[None, :],
                (c_kv.shape[0], c_kv.shape[1]),
            )
            kv_segment_ids = valid.astype(jnp.int32)
        else:
            kv_positions = positions
            kv_segment_ids = segment_ids

        # expand latent -> per-head nope key and value
        kv = DenseGeneral((n, d_nope + d_v), kernel_axes=("kv_lora", "kv_heads", "kv_head_dim"),
                          name="wkv_b", **common)(c_kv)
        k_nope, v = kv[..., :d_nope], kv[..., d_nope:]
        k = jnp.concatenate(
            [k_nope, jnp.broadcast_to(k_pe[..., None, :], k_nope.shape[:-1] + (d_rope,))],
            axis=-1,
        )
        q_full = jnp.concatenate([q_nope, q_pe], axis=-1)

        scale = 1.0 / np.sqrt(d_qk)
        if cfg.rope_type == "yarn":
            ms = rope_lib.yarn_attention_scaling(cfg.rope_factor)
            scale = scale * ms * ms

        q_full = shard(q_full, "activation_batch", "activation_length", "activation_heads", None)
        if mode == MODE_AUTOREGRESSIVE:
            mask = kv_segment_ids[:, None, None, :] > 0
        else:
            mask = make_attention_mask(
                positions, kv_positions, segment_ids, kv_segment_ids, causal=True
            )
        out = dot_product_attention(
            q_full * (scale * np.sqrt(d_qk)),  # fold custom scale: kernel divides by sqrt(d)
            k, v, mask, cfg.attn_logits_soft_cap, cfg.float32_qk_product,
        )

        return DenseGeneral(
            inputs.shape[-1], axis=(-2, -1), kernel_axes=("heads", "kv_head_dim", "embed"),
            name="out", **common,
        )(out)

    def _latent_cache(self, c_kv, k_pe, mode, segment_ids=None):
        """Cache the compressed latent (c_kv, k_pe) — not expanded K/V.
        Prefill prompts arrive PADDED to the bucket width: cache_index must
        be the true per-row length (from segment_ids), not the padded width,
        or decode attends garbage latents and overwrites the wrong slot."""
        cfg = self.cfg
        b = c_kv.shape[0]
        max_len = cfg.max_target_length
        cc = self.variable(
            "cache", "cached_ckv", jnp.zeros, (b, max_len, c_kv.shape[-1]), c_kv.dtype
        )
        cp = self.variable(
            "cache", "cached_kpe", jnp.zeros, (b, max_len, k_pe.shape[-1]), k_pe.dtype
        )
        idx = self.variable("cache", "cache_index", jnp.zeros, (b,), jnp.int32)
        if mode == MODE_PREFILL:
            ln = c_kv.shape[1]
            cc.value = jax.lax.dynamic_update_slice(cc.value, c_kv, (0, 0, 0))
            cp.value = jax.lax.dynamic_update_slice(cp.value, k_pe, (0, 0, 0))
            if segment_ids is not None:
                true_len = jnp.sum((segment_ids != 0).astype(jnp.int32), axis=1)
            else:
                true_len = jnp.full((b,), ln, jnp.int32)
            idx.value = true_len.astype(jnp.int32)
            visible = idx.value
        elif mode == MODE_VERIFY:
            # speculative verify: write the whole [B, K+1, d] draft span at
            # per-slot offsets WITHOUT advancing cache_index — the engine
            # commits the accepted length afterwards (infer/speculative.py).
            cc.value = _row_update(cc.value, c_kv, idx.value)
            cp.value = _row_update(cp.value, k_pe, idx.value)
            visible = idx.value + c_kv.shape[1]
        else:
            pos = idx.value  # [B]
            rows = jnp.arange(b)
            cc.value = cc.value.at[rows, pos].set(c_kv[:, 0])
            cp.value = cp.value.at[rows, pos].set(k_pe[:, 0])
            idx.value = pos + 1
            visible = idx.value
        valid = jnp.arange(max_len)[None, :] < visible[:, None]
        return cc.value, cp.value, idx.value, valid
