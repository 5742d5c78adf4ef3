"""Vector quantizers: factorized VQ + residual VQ (JAX/flax).

Counterpart of reference maskgct/quantize.py (FactorizedVectorQuantize:17,
ResidualVQ:122) and acoustic/quantize_extended.py. The factorized quantizer
projects to a low-dim codebook space (8-d), l2-normalizes, takes the nearest
codebook row (cosine distance via one matmul — MXU-friendly, no [T, K, D]
broadcast), and straight-through-estimates the gradient.

Layout: [B, T, D] channels-last.
"""

from __future__ import annotations

from typing import NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuantizeResult(NamedTuple):
    quantized: jax.Array  # [B,T,D] (input space, after project_out)
    indices: jax.Array  # [B,T] int32
    commit_loss: jax.Array  # scalar
    codebook_loss: jax.Array  # scalar
    # per-sample [B] losses (reference keeps these for quantizer-dropout
    # masking, quantize.py:70-80); scalars above are their means
    commit_per_sample: jax.Array | None = None
    codebook_per_sample: jax.Array | None = None


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=axis, keepdims=True) + eps)


class FactorizedVectorQuantize(nn.Module):
    input_dim: int
    codebook_size: int
    codebook_dim: int = 8
    commitment: float = 0.15
    codebook_loss_weight: float = 1.0
    use_l2_normalize: bool = True

    def setup(self):
        if self.input_dim != self.codebook_dim:
            self.in_proj = nn.Dense(self.codebook_dim, name="in_proj")
            self.out_proj = nn.Dense(self.input_dim, name="out_proj")
        self.codebook = self.param(
            "codebook",
            nn.initializers.normal(1.0),
            (self.codebook_size, self.codebook_dim),
            jnp.float32,
        )

    def _project_in(self, x):
        return self.in_proj(x) if self.input_dim != self.codebook_dim else x

    def _project_out(self, z):
        return self.out_proj(z) if self.input_dim != self.codebook_dim else z

    def encode_latents(self, x) -> tuple[jax.Array, jax.Array]:
        """x: [B,T,input_dim] -> (z_e [B,T,cb_dim], indices [B,T]).

        z_e is the UNNORMALIZED projected latent: the reference l2-normalizes
        only for the nearest-neighbor search (quantize.py:95-113) — losses,
        the straight-through estimator, and the quantized output all live in
        raw codebook space.
        """
        z_e = self._project_in(x)
        zn, cb = z_e, self.codebook
        if self.use_l2_normalize:
            zn = _l2norm(zn)
            cb = _l2norm(cb)
        # nearest neighbor: for l2-normalized vectors argmin ||z-c|| ==
        # argmax z.c — one [B*T, K] matmul on the MXU.
        sim = jnp.einsum("btd,kd->btk", zn, cb)
        if not self.use_l2_normalize:
            sim = 2 * sim - jnp.sum(jnp.square(cb), axis=-1)[None, None, :]
        indices = jnp.argmax(sim, axis=-1).astype(jnp.int32)
        return z_e, indices

    def decode_code(self, indices) -> jax.Array:
        """indices [B,T] -> RAW codebook rows [B,T,cb_dim] (reference
        decode_code is a plain embedding lookup, quantize.py:91-95)."""
        return jnp.take(self.codebook, indices, axis=0)

    def __call__(self, x) -> QuantizeResult:
        z_e, indices = self.encode_latents(x)
        z_q = self.decode_code(indices)

        commit_ps = jnp.mean(
            jnp.square(z_e - jax.lax.stop_gradient(z_q)), axis=(1, 2)
        ) * self.commitment
        codebook_ps = jnp.mean(
            jnp.square(jax.lax.stop_gradient(z_e) - z_q), axis=(1, 2)
        ) * self.codebook_loss_weight
        # straight-through
        z_q = z_e + jax.lax.stop_gradient(z_q - z_e)
        out = self._project_out(z_q)
        return QuantizeResult(
            out, indices,
            jnp.mean(commit_ps), jnp.mean(codebook_ps),
            commit_ps, codebook_ps,
        )

    def vq2emb(self, indices) -> jax.Array:
        """indices [B,T] -> input-space embeddings [B,T,input_dim]."""
        return self._project_out(self.decode_code(indices))

    def latent2dist(self, x) -> jax.Array:
        """[B,T,input_dim] -> similarity logits [B,T,K]."""
        z_e = self._project_in(x)
        cb = self.codebook
        if self.use_l2_normalize:
            z_e, cb = _l2norm(z_e), _l2norm(cb)
        return jnp.einsum("btd,kd->btk", z_e, cb)


class ResidualVQ(nn.Module):
    """Stack of factorized quantizers over successive residuals
    (reference: maskgct/quantize.py:122)."""

    input_dim: int
    num_quantizers: int
    codebook_size: int
    codebook_dim: int = 8
    commitment: float = 0.15
    codebook_loss_weight: float = 1.0
    use_l2_normalize: bool = True
    # train-time regularizer: this fraction of each batch uses a random
    # quantizer count in [1, Q] (reference quantize.py:193-199); active only
    # when __call__ receives dropout_rng
    quantizer_dropout: float = 0.0

    def setup(self):
        self.quantizers = [
            FactorizedVectorQuantize(
                input_dim=self.input_dim,
                codebook_size=self.codebook_size,
                codebook_dim=self.codebook_dim,
                commitment=self.commitment,
                codebook_loss_weight=self.codebook_loss_weight,
                use_l2_normalize=self.use_l2_normalize,
                name=f"vq_{i}",
            )
            for i in range(self.num_quantizers)
        ]

    def __call__(self, x, n_quantizers: int | None = None, dropout_rng=None):
        """Returns (quantized_out [B,T,D], indices [Q,B,T], commit_losses [Q],
        codebook_losses [Q], per_layer_quantized [Q,B,T,D]).

        With ``dropout_rng`` and quantizer_dropout > 0, the first
        ceil(B*dropout) samples use a random quantizer count in [1, Q]:
        later stages' contributions and losses are masked per sample
        (residuals still advance unmasked — reference quantize.py:193-218).
        """
        n = n_quantizers or self.num_quantizers
        b = x.shape[0]
        n_per_sample = None
        if dropout_rng is not None and self.quantizer_dropout > 0:
            draw = jax.random.randint(
                dropout_rng, (b,), 1, self.num_quantizers + 1
            )
            n_drop = int(b * self.quantizer_dropout)
            n_per_sample = jnp.where(
                jnp.arange(b) < n_drop, draw, self.num_quantizers + 1
            )
        residual = x
        out = jnp.zeros_like(x)
        all_idx, all_commit, all_cb, all_q = [], [], [], []
        for i, q in enumerate(self.quantizers[:n]):
            res = q(residual)
            residual = residual - res.quantized
            if n_per_sample is None:
                out = out + res.quantized
                all_commit.append(res.commit_loss)
                all_cb.append(res.codebook_loss)
            else:
                mask = (i < n_per_sample).astype(x.dtype)  # [B]
                out = out + res.quantized * mask[:, None, None]
                all_commit.append(jnp.mean(res.commit_per_sample * mask))
                all_cb.append(jnp.mean(res.codebook_per_sample * mask))
            all_idx.append(res.indices)
            all_q.append(res.quantized)
        return (
            out,
            jnp.stack(all_idx),
            jnp.stack(all_commit),
            jnp.stack(all_cb),
            jnp.stack(all_q),
        )

    def quantize(self, x, n_quantizers: int | None = None):
        out, idx, _, _, _ = self(x, n_quantizers)
        return out, idx

    def vq2emb(self, indices, n_quantizers: int | None = None) -> jax.Array:
        """indices [Q,B,T] -> summed input-space embeddings [B,T,D]."""
        n = n_quantizers or self.num_quantizers
        out = None
        for i in range(min(n, indices.shape[0])):
            e = self.quantizers[i].vq2emb(indices[i])
            out = e if out is None else out + e
        return out

    def latent2dist(self, x, n_quantizers: int | None = None):
        """Per-layer distance logits following the residual chain."""
        n = n_quantizers or self.num_quantizers
        residual = x
        dists = []
        for q in self.quantizers[:n]:
            d = q.latent2dist(residual)
            idx = jnp.argmax(d, axis=-1)
            quantized = q.vq2emb(idx)
            residual = residual - quantized
            dists.append(d)
        return jnp.stack(dists)
