"""Top-level Transformer: shared embedding -> Decoder -> logits.

Reference: MaxText/layers/models.py:41 Transformer. Logits either via a
separate unembedding DenseGeneral or tied to the embedding table
(logits_via_embedding).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.models.attention import MODE_TRAIN
from maxtext_indextts2_tpu.models.decoder import Decoder
from maxtext_indextts2_tpu.models.layers import DenseGeneral, Embed, RMSNorm
from maxtext_indextts2_tpu.models.registry import get_block_style
from maxtext_indextts2_tpu.parallel.sharding import shard


class Transformer(nn.Module):
    cfg: Config
    mesh: Any = None

    def setup(self):
        cfg = self.cfg
        self.block = get_block_style(cfg.decoder_block)
        self.token_embedder = Embed(
            num_embeddings=cfg.vocab_size,
            features=cfg.emb_dim,
            dtype=jnp.dtype(cfg.dtype),
            weight_dtype=jnp.dtype(cfg.weight_dtype),
            name="token_embedder",
        )
        self.decoder = Decoder(cfg=cfg, block=self.block, mesh=self.mesh, name="decoder")
        self.final_norm = RMSNorm(
            epsilon=cfg.normalization_layer_epsilon,
            dtype=jnp.dtype(cfg.dtype),
            weight_dtype=jnp.dtype(cfg.weight_dtype),
            scale_plus_one=self.block.rmsnorm_scale_plus_one,
            use_mean=self.block.use_layer_norm,
            use_bias=self.block.use_layer_norm,
            name="decoder_norm",
        )
        if cfg.use_positional_embedding:
            self.position_embedder = Embed(
                num_embeddings=cfg.max_target_length,
                features=cfg.emb_dim,
                dtype=jnp.dtype(cfg.dtype),
                weight_dtype=jnp.dtype(cfg.weight_dtype),
                name="position_embedder",
            )
        if cfg.mtp_num_layers > 0:
            from maxtext_indextts2_tpu.models.mtp import MTPLayer

            self.mtp_layers = [
                MTPLayer(cfg=cfg, block=self.block, mesh=self.mesh, name=f"mtp_{k}")
                for k in range(1, cfg.mtp_num_layers + 1)
            ]
        if not cfg.logits_via_embedding:
            self.logits_dense = DenseGeneral(
                features=cfg.vocab_size,
                kernel_axes=("embed", "vocab"),
                dtype=jnp.dtype(cfg.dtype) if not cfg.logits_dot_in_fp32 else jnp.float32,
                weight_dtype=jnp.dtype(cfg.weight_dtype),
                matmul_precision=cfg.matmul_precision,
                name="logits_dense",
            )

    def prelogits(self, y: jax.Array) -> jax.Array:
        """Final-normed, sharded hidden states — the input the fused
        chunked-vocab CE consumes instead of full logits
        (ops/losses.py chunked_unembed_cross_entropy)."""
        y = self.final_norm(y)
        return shard(
            y, "activation_embed_and_logits_batch", "activation_norm_length",
            "activation_embed",
        )

    def _unembed(self, y: jax.Array) -> jax.Array:
        cfg = self.cfg
        y = self.prelogits(y)
        if cfg.logits_via_embedding:
            logits = self.token_embedder.attend(y, normalize=cfg.normalize_embedding_logits)
        else:
            logits = self.logits_dense(y)
        if cfg.final_logits_soft_cap > 0.0:
            logits = cfg.final_logits_soft_cap * jnp.tanh(logits / cfg.final_logits_soft_cap)
        logits = shard(
            logits, "activation_embed_and_logits_batch", "activation_norm_length", "activation_vocab"
        )
        if cfg.cast_logits_to_fp32:
            logits = logits.astype(jnp.float32)
        return logits

    def __call__(
        self,
        tokens: jax.Array,  # [B, S] int32
        positions: jax.Array,  # [B, S] int32
        segment_ids: jax.Array | None = None,  # [B, S] int32, 0 = padding
        mode: str = MODE_TRAIN,
        deterministic: bool = True,
        targets: jax.Array | None = None,  # enables the MTP aux loss
        target_weights: jax.Array | None = None,
        cache_offset=None,  # chunked prefill: global start of this chunk
        vision_embeddings: jax.Array | None = None,  # [B, T_img, E] soft tokens
        page_state=None,  # paged decode: infer.page_manager.PageState
        return_prelogits: bool = False,  # fused-vocab CE: skip the unembed
    ) -> jax.Array:
        cfg = self.cfg
        emb = self.token_embedder(tokens)
        if self.block.scale_embedding:
            emb = emb * jnp.asarray(cfg.emb_dim**0.5, emb.dtype)
        if vision_embeddings is not None:
            # image soft tokens replace the (scaled) text embeddings at
            # image-token positions (reference: HF Gemma3Model merge;
            # multimodal_utils token fusion)
            from maxtext_indextts2_tpu.models.vision import merge_vision_embeddings

            emb = merge_vision_embeddings(
                emb, vision_embeddings, tokens, cfg.image_token_id
            )
        if cfg.use_positional_embedding:
            emb = emb + self.position_embedder(positions)

        y = self.decoder(emb, positions, segment_ids, mode=mode,
                         deterministic=deterministic, cache_offset=cache_offset,
                         page_state=page_state)

        if cfg.mtp_num_layers > 0 and mode == MODE_TRAIN and targets is not None:
            self._mtp_loss(y, tokens, targets, target_weights, positions, segment_ids,
                           deterministic)

        if return_prelogits:
            return self.prelogits(y)
        return self._unembed(y)

    def _mtp_loss(self, hidden, tokens, targets, target_weights, positions,
                  segment_ids, deterministic):
        """DeepSeek-style MTP aux loss, sown as an intermediate."""
        from maxtext_indextts2_tpu.ops.losses import cross_entropy_with_logits

        cfg = self.cfg
        w0 = target_weights if target_weights is not None else (
            (segment_ids != 0).astype(jnp.float32)
            if segment_ids is not None
            else jnp.ones_like(tokens, jnp.float32)
        )
        h = hidden
        total_loss, total_weight = 0.0, 0.0
        for k in range(1, cfg.mtp_num_layers + 1):
            tok_k = jnp.roll(tokens, -k, axis=1)
            tgt_k = jnp.roll(targets, -k, axis=1)
            valid = jnp.arange(tokens.shape[1])[None, :] < tokens.shape[1] - k
            w_k = jnp.roll(w0, -k, axis=1) * valid
            emb_k = self.token_embedder(tok_k)
            h = self.mtp_layers[k - 1](h, emb_k, positions, segment_ids, deterministic)
            logits = self._unembed(h).astype(jnp.float32)
            ce, _ = cross_entropy_with_logits(logits, tgt_k, 0.0)
            total_loss += jnp.sum(ce * w_k)
            total_weight += jnp.sum(w_k)
        mtp_loss = total_loss / jnp.maximum(total_weight, 1e-6)
        self.sow("intermediates", "mtp_loss", mtp_loss)
        return mtp_loss
