"""Vocos backbone (ConvNeXt-1D) + ISTFT head, in JAX/flax.

Counterpart of reference maskgct/vocos.py (ConvNeXtBlock:11, AdaLayerNorm:70,
VocosBackbone:116). The reference's decode path ends at the backbone hidden
states and never produces a waveform (defect noted in SURVEY.md §7); here the
standard Vocos ISTFT head (Linear -> magnitude/phase -> inverse STFT with
overlap-add) completes token->waveform generation on-device.

Layout convention: [B, T, C] (time-major channels-last — the TPU-friendly
layout; the torch reference uses [B, C, T]).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvNeXtBlock(nn.Module):
    dim: int
    intermediate_dim: int
    layer_scale_init_value: float = 1e-2
    adanorm_num_embeddings: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond_id: jax.Array | None = None) -> jax.Array:
        residual = x
        # depthwise conv k=7
        x = nn.Conv(
            self.dim, kernel_size=(7,), padding="SAME",
            feature_group_count=self.dim, dtype=self.dtype, name="dwconv",
        )(x)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim, name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(self.intermediate_dim, dtype=self.dtype, name="pwconv1")(x)
        x = jax.nn.gelu(x, approximate=False)
        x = nn.Dense(self.dim, dtype=self.dtype, name="pwconv2")(x)
        gamma = self.param(
            "gamma",
            nn.initializers.constant(self.layer_scale_init_value),
            (self.dim,),
            jnp.float32,
        )
        return residual + gamma * x


class AdaLayerNorm(nn.Module):
    """LayerNorm whose scale/shift are embedding lookups of a condition id
    (reference: maskgct/vocos.py:70)."""

    num_embeddings: int
    dim: int

    @nn.compact
    def __call__(self, x: jax.Array, cond_id: jax.Array) -> jax.Array:
        scale = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.ones, name="scale")(cond_id)
        shift = nn.Embed(self.num_embeddings, self.dim,
                         embedding_init=nn.initializers.zeros, name="shift")(cond_id)
        x = nn.LayerNorm(epsilon=1e-6, use_bias=False, use_scale=False)(x)
        while scale.ndim < x.ndim:
            scale = scale[:, None]
            shift = shift[:, None]
        return x * scale + shift


class VocosBackbone(nn.Module):
    input_channels: int
    dim: int = 512
    intermediate_dim: int = 2048
    num_layers: int = 30
    adanorm_num_embeddings: int | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, cond_id: jax.Array | None = None) -> jax.Array:
        """[B, T, input_channels] -> [B, T, dim]."""
        x = nn.Conv(self.dim, kernel_size=(7,), padding="SAME", dtype=self.dtype,
                    name="embed")(x)
        if self.adanorm_num_embeddings:
            x = AdaLayerNorm(self.adanorm_num_embeddings, self.dim, name="norm")(x, cond_id)
        else:
            x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        scale_init = 1.0 / self.num_layers
        for i in range(self.num_layers):
            x = ConvNeXtBlock(
                self.dim, self.intermediate_dim, scale_init,
                self.adanorm_num_embeddings, self.dtype, name=f"convnext_{i}",
            )(x, cond_id)
        return nn.LayerNorm(epsilon=1e-6, name="final_layer_norm")(x)


def istft_overlap_add(
    spec_real: jax.Array, spec_imag: jax.Array, n_fft: int, hop: int
) -> jax.Array:
    """[B, F, n_fft//2+1] complex (as re/im) -> [B, (F-1)*hop + n_fft] -> cropped
    to F*hop. Hann-windowed inverse STFT with window-square normalization."""
    spec = jax.lax.complex(spec_real.astype(jnp.float32), spec_imag.astype(jnp.float32))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1)  # [B, F, n_fft]
    win = jnp.hanning(n_fft + 1)[:-1].astype(jnp.float32)
    frames = frames * win

    b, f, _ = frames.shape
    assert n_fft % hop == 0, "istft requires hop | n_fft"
    ratio = n_fft // hop
    # overlap-add WITHOUT scatter (TPU scatters serialize): frame i's k-th
    # hop-chunk lands in output hop-block i+k -> ratio static slice-adds.
    fr = frames.reshape(b, f, ratio, hop)
    blocks = f + ratio - 1
    out = jnp.zeros((b, blocks, hop), jnp.float32)
    wsq = jnp.square(win).reshape(ratio, hop)
    norm = jnp.zeros((blocks, hop), jnp.float32)
    for k in range(ratio):
        out = out.at[:, k : k + f].add(fr[:, :, k])
        norm = norm.at[k : k + f].add(jnp.broadcast_to(wsq[k], (f, hop)))
    out = out / jnp.maximum(norm, 1e-8)[None]
    out = out.reshape(b, blocks * hop)
    pad = (n_fft - hop) // 2
    return out[:, pad : pad + f * hop]


class ISTFTHead(nn.Module):
    """Vocos head: hidden -> (mag, phase) -> ISTFT waveform."""

    n_fft: int = 1920
    hop: int = 480

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """[B, T, C] -> [B, T*hop] waveform."""
        out = nn.Dense(self.n_fft + 2, name="out")(x)
        mag, phase = jnp.split(out, 2, axis=-1)
        mag = jnp.exp(jnp.clip(mag, -20.0, 20.0))  # avoid overflow (vocos clip 1e2)
        mag = jnp.minimum(mag, 1e2)
        real = mag * jnp.cos(phase)
        imag = mag * jnp.sin(phase)
        return istft_overlap_add(real, imag, self.n_fft, self.hop)
