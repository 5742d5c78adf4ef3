"""Multi-token prediction (DeepSeek-V3 style).

Reference: MaxText/layers/multi_token_prediction.py
(MultiTokenPredictionLayer:58, MultiTokenPredictionBlock:177,
calculate_mtp_loss:258). Each MTP depth k re-embeds the k-shifted token
stream, fuses it with the trunk hidden state (norm+concat+projection), runs
one decoder layer, and predicts token t+k+1 with the shared unembedding.

The per-depth fusion layer lives here; the loop + embedding/unembedding run
in the Transformer's scope (shared modules can't be called from a child
scope in linen).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.models.layers import DenseGeneral, RMSNorm


class MTPLayer(nn.Module):
    """One MTP depth: fuse (hidden, shifted-token embedding) -> decoder layer."""

    cfg: Config
    block: Any
    mesh: Any = None

    @nn.compact
    def __call__(self, hidden, emb_k, positions, segment_ids, deterministic=True):
        from maxtext_indextts2_tpu.models.decoder import DecoderLayer

        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        norm = lambda name: RMSNorm(
            epsilon=cfg.normalization_layer_epsilon, dtype=dtype,
            weight_dtype=jnp.dtype(cfg.weight_dtype), name=name,
        )
        fused = jnp.concatenate(
            [norm("hidden_norm")(hidden), norm("emb_norm")(emb_k.astype(dtype))], axis=-1
        )
        h = DenseGeneral(
            features=cfg.emb_dim,
            kernel_axes=("embed", "embed_no_exp"),
            dtype=dtype,
            weight_dtype=jnp.dtype(cfg.weight_dtype),
            name="projection",
        )(fused)
        h, _ = DecoderLayer(cfg=cfg, block=self.block, mesh=self.mesh, name="layer")(
            h, positions, segment_ids, "train", deterministic
        )
        return h
