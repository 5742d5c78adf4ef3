"""RepCodec: semantic codec quantizing w2v-BERT features to 8192 tokens.

Counterpart of reference maskgct/repcodec_model.py (RepCodec:29, quantize:157):
VocosBackbone encoder over 1024-d semantic features -> 1-stage ResidualVQ
(factorized, codebook 8192x8, l2-normalized, commitment 0.15) -> VocosBackbone
decoder reconstructing the features. ``quantize`` is the inference path used
by the semantic tokenizer; ``__call__`` is the training autoencoder.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.audio.quantize import ResidualVQ
from maxtext_indextts2_tpu.audio.vocos import VocosBackbone


class RepCodec(nn.Module):
    hidden_size: int = 1024
    codebook_size: int = 8192
    codebook_dim: int = 8
    vocos_dim: int = 384
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 12
    num_quantizers: int = 1

    def setup(self):
        self.encoder = VocosBackbone(
            input_channels=self.hidden_size,
            dim=self.vocos_dim,
            intermediate_dim=self.vocos_intermediate_dim,
            num_layers=self.vocos_num_layers,
            name="encoder",
        )
        self.enc_proj = nn.Dense(self.hidden_size, name="enc_proj")
        self.quantizer = ResidualVQ(
            input_dim=self.hidden_size,
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            commitment=0.15,
            name="quantizer",
        )
        self.decoder = VocosBackbone(
            input_channels=self.hidden_size,
            dim=self.vocos_dim,
            intermediate_dim=self.vocos_intermediate_dim,
            num_layers=self.vocos_num_layers,
            name="decoder",
        )
        self.dec_proj = nn.Dense(self.hidden_size, name="dec_proj")

    def encode(self, feats: jax.Array) -> jax.Array:
        return self.enc_proj(self.encoder(feats))

    def __call__(self, feats: jax.Array):
        """Training autoencoder: returns (recon, indices, commit, codebook)."""
        x = self.encode(feats)
        quantized, idx, commit, cb, _ = self.quantizer(x)
        recon = self.dec_proj(self.decoder(quantized))
        return recon, idx, jnp.sum(commit), jnp.sum(cb)

    def quantize(self, feats: jax.Array) -> jax.Array:
        """[B,T,1024] semantic features -> [B,T] token ids in [0, 8192)."""
        x = self.encode(feats)
        _, idx = self.quantizer.quantize(x)
        return idx[0]  # single quantizer stage

    def vq2emb(self, indices: jax.Array) -> jax.Array:
        return self.quantizer.vq2emb(indices[None])
