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
            name="decoder_norm",
        )
        if not cfg.logits_via_embedding:
            self.logits_dense = DenseGeneral(
                features=cfg.vocab_size,
                kernel_axes=("embed", "vocab"),
                dtype=jnp.dtype(cfg.dtype) if not cfg.logits_dot_in_fp32 else jnp.float32,
                weight_dtype=jnp.dtype(cfg.weight_dtype),
                matmul_precision=cfg.matmul_precision,
                name="logits_dense",
            )

    def __call__(
        self,
        tokens: jax.Array,  # [B, S] int32
        positions: jax.Array,  # [B, S] int32
        segment_ids: jax.Array | None = None,  # [B, S] int32, 0 = padding
        mode: str = MODE_TRAIN,
        deterministic: bool = True,
    ) -> jax.Array:
        cfg = self.cfg
        emb = self.token_embedder(tokens)
        if self.block.scale_embedding:
            emb = emb * jnp.asarray(cfg.emb_dim**0.5, emb.dtype)

        y = self.decoder(emb, positions, segment_ids, mode=mode, deterministic=deterministic)
        y = self.final_norm(y)
        y = shard(y, "activation_embed_and_logits_batch", "activation_norm_length", "activation_embed")

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
