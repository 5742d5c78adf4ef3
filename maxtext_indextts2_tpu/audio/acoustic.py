"""Acoustic codec: DAC/SoundStream-style encoder + 12-layer RVQ + Vocos decoder.

Counterpart of reference maskgct/acoustic/codec.py (Snake1d:27,
ResidualUnit:58, EncoderBlock:79, CodecEncoder:126 strides [3,4,5,8],
CodecDecoder:195 12-layer RVQ codebook 1024 + Vocos decode, vq2emb:384).
24 kHz audio; total encoder stride 480 -> 50 Hz acoustic tokens.

The reference's Vocos decode path stops at backbone hidden states (defect —
see SURVEY.md §7); here an ISTFT head (n_fft=1920, hop=480) completes
tokens -> waveform on-device.

Layout: [B, T, C] channels-last ([B, T] waveforms).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.audio.quantize import ResidualVQ
from maxtext_indextts2_tpu.audio.vocos import ISTFTHead, VocosBackbone


def snake(x: jax.Array, alpha: jax.Array) -> jax.Array:
    """Snake activation x + sin^2(alpha x)/alpha (reference codec.py:27)."""
    return x + jnp.square(jnp.sin(alpha * x)) / jnp.maximum(alpha, 1e-9)


class Snake1d(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, x):
        alpha = self.param("alpha", nn.initializers.ones, (self.channels,), jnp.float32)
        return snake(x, alpha)


class ResidualUnit(nn.Module):
    dim: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        y = Snake1d(self.dim, name="snake1")(x)
        y = nn.Conv(self.dim, kernel_size=(7,), kernel_dilation=(self.dilation,),
                    padding="SAME", name="conv1")(y)
        y = Snake1d(self.dim, name="snake2")(y)
        y = nn.Conv(self.dim, kernel_size=(1,), name="conv2")(y)
        return x + y


class EncoderBlock(nn.Module):
    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        in_dim = self.out_dim // 2
        x = ResidualUnit(in_dim, 1, name="res1")(x)
        x = ResidualUnit(in_dim, 3, name="res2")(x)
        x = ResidualUnit(in_dim, 9, name="res3")(x)
        x = Snake1d(in_dim, name="snake")(x)
        x = nn.Conv(
            self.out_dim,
            kernel_size=(2 * self.stride,),
            strides=(self.stride,),
            padding=[(int(np.ceil(self.stride / 2)),) * 2],
            name="down",
        )(x)
        return x


class CodecEncoder(nn.Module):
    """24 kHz wav -> [B, T/480, out_channels] latents."""

    d_model: int = 96
    strides: tuple[int, ...] = (3, 4, 5, 8)
    out_channels: int = 256
    use_tanh: bool = False

    @nn.compact
    def __call__(self, wav: jax.Array) -> jax.Array:
        x = wav[..., None]  # [B, T, 1]
        d = self.d_model
        x = nn.Conv(d, kernel_size=(7,), padding="SAME", name="conv_in")(x)
        for i, s in enumerate(self.strides):
            d *= 2
            x = EncoderBlock(d, s, name=f"block_{i}")(x)
        x = Snake1d(d, name="snake_out")(x)
        x = nn.Conv(self.out_channels, kernel_size=(3,), padding="SAME", name="conv_out")(x)
        if self.use_tanh:
            x = jnp.tanh(x)
        return x


class UpsampleConv(nn.Module):
    """Transposed conv (torch ConvTranspose1d k=2s, stride s,
    padding=ceil(s/2), output_padding=s%2 — reference codec.py:106-113)
    expressed as an input-dilated conv: TPU-friendly (XLA lowers
    lhs_dilation onto the MXU directly; exact length T*s)."""

    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        s = self.stride
        k = 2 * s
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (k, x.shape[-1], self.out_dim), jnp.float32,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_dim,), jnp.float32)
        p = s // 2 + s % 2  # torch padding
        lo = k - 1 - p
        hi = k - 1 - p + (s % 2)
        y = jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1,), padding=[(lo, hi)],
            lhs_dilation=(s,), dimension_numbers=("NWC", "WIO", "NWC"),
        )
        return y + bias


class DecoderBlock(nn.Module):
    """Upsampling decoder block (reference codec.py:102): Snake ->
    transposed conv -> 3 dilated residual units."""

    in_dim: int
    out_dim: int
    stride: int

    @nn.compact
    def __call__(self, x):
        x = Snake1d(self.in_dim, name="snake")(x)
        x = UpsampleConv(self.out_dim, self.stride, name="up")(x)
        x = ResidualUnit(self.out_dim, 1, name="res1")(x)
        x = ResidualUnit(self.out_dim, 3, name="res2")(x)
        x = ResidualUnit(self.out_dim, 9, name="res3")(x)
        return x


class ConvDecoder(nn.Module):
    """DAC-style conv waveform decoder (reference CodecDecoder
    use_vocos=False branch, codec.py:303-324): conv-in, halving-channel
    DecoderBlocks, Snake, conv-out, tanh."""

    in_channels: int
    upsample_initial_channel: int = 1024
    up_ratios: tuple[int, ...] = (5, 5, 4, 2)

    @nn.compact
    def __call__(self, x):
        """[B, T, in_channels] -> [B, T * prod(up_ratios)] waveform."""
        c = self.upsample_initial_channel
        x = nn.Conv(c, kernel_size=(7,), padding="SAME", name="conv_in")(x)
        for i, s in enumerate(self.up_ratios):
            x = DecoderBlock(c // 2 ** i, c // 2 ** (i + 1), s, name=f"block_{i}")(x)
        out = c // 2 ** len(self.up_ratios)
        x = Snake1d(out, name="snake_out")(x)
        x = nn.Conv(1, kernel_size=(7,), padding="SAME", name="conv_out")(x)
        return jnp.tanh(x)[..., 0]


class CodecDecoder(nn.Module):
    """RVQ over latents + Vocos decode to waveform.

    API parity with reference CodecDecoder: quantize / vq2emb / decode /
    latent2dist.
    """

    in_channels: int = 256
    num_quantizers: int = 12
    codebook_size: int = 1024
    codebook_dim: int = 8
    commitment: float = 0.15
    codebook_loss_weight: float = 1.0
    quantizer_dropout: float = 0.0
    vocos_dim: int = 512
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 30
    n_fft: int = 1920
    hop: int = 480
    # False -> DAC-style conv decoder (reference use_vocos=False branch)
    use_vocos: bool = True
    upsample_initial_channel: int = 1024
    up_ratios: tuple[int, ...] = (5, 5, 4, 2)

    def setup(self):
        self.quantizer = ResidualVQ(
            input_dim=self.in_channels,
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            commitment=self.commitment,
            codebook_loss_weight=self.codebook_loss_weight,
            use_l2_normalize=True,
            quantizer_dropout=self.quantizer_dropout,
            name="quantizer",
        )
        if self.use_vocos:
            self.backbone = VocosBackbone(
                input_channels=self.in_channels,
                dim=self.vocos_dim,
                intermediate_dim=self.vocos_intermediate_dim,
                num_layers=self.vocos_num_layers,
                name="model",
            )
            self.head = ISTFTHead(n_fft=self.n_fft, hop=self.hop, name="head")
        else:
            self.conv_decoder = ConvDecoder(
                in_channels=self.in_channels,
                upsample_initial_channel=self.upsample_initial_channel,
                up_ratios=self.up_ratios,
                name="model",
            )

    def __call__(self, latents: jax.Array, n_quantizers: int | None = None,
                 dropout_rng=None):
        """Training: quantize + decode. Returns (wav, indices, commit, cb)."""
        quantized, idx, commit, cb, _ = self.quantizer(
            latents, n_quantizers, dropout_rng=dropout_rng
        )
        wav = self.decode(quantized)
        return wav, idx, jnp.sum(commit), jnp.sum(cb)

    def quantize(self, latents: jax.Array, n_quantizers: int | None = None):
        return self.quantizer.quantize(latents, n_quantizers)

    def vq2emb(self, indices: jax.Array, n_quantizers: int | None = None) -> jax.Array:
        """[Q,B,T] acoustic token ids -> [B,T,in_channels] embeddings."""
        return self.quantizer.vq2emb(indices, n_quantizers)

    def decode(self, quantized: jax.Array) -> jax.Array:
        """[B,T,in_channels] -> [B, T*hop] waveform."""
        if self.use_vocos:
            return self.head(self.backbone(quantized))
        return self.conv_decoder(quantized)

    def latent2dist(self, latents: jax.Array, n_quantizers: int | None = None):
        return self.quantizer.latent2dist(latents, n_quantizers)


class AcousticCodec(nn.Module):
    """Encoder + decoder pair with a tokenize()/detokenize() inference API."""

    d_model: int = 96
    strides: tuple[int, ...] = (3, 4, 5, 8)
    latent_dim: int = 256
    num_quantizers: int = 12
    codebook_size: int = 1024
    codebook_dim: int = 8
    quantizer_dropout: float = 0.0
    vocos_dim: int = 512
    vocos_intermediate_dim: int = 2048
    vocos_num_layers: int = 30

    def setup(self):
        self.encoder = CodecEncoder(
            d_model=self.d_model, strides=self.strides,
            out_channels=self.latent_dim, name="encoder",
        )
        self.decoder = CodecDecoder(
            in_channels=self.latent_dim,
            num_quantizers=self.num_quantizers,
            codebook_size=self.codebook_size,
            codebook_dim=self.codebook_dim,
            quantizer_dropout=self.quantizer_dropout,
            vocos_dim=self.vocos_dim,
            vocos_intermediate_dim=self.vocos_intermediate_dim,
            vocos_num_layers=self.vocos_num_layers,
            name="decoder",
        )

    def __call__(self, wav: jax.Array, dropout_rng=None):
        """Training autoencoder path."""
        latents = self.encoder(wav)
        recon, idx, commit, cb = self.decoder(latents, dropout_rng=dropout_rng)
        return recon, idx, commit, cb

    def tokenize(self, wav: jax.Array) -> jax.Array:
        """[B, T] 24 kHz wav -> [Q, B, T/480] acoustic token ids."""
        latents = self.encoder(wav)
        _, idx = self.decoder.quantize(latents)
        return idx

    def detokenize(self, indices: jax.Array) -> jax.Array:
        """[Q, B, T] token ids -> [B, T*480] waveform."""
        emb = self.decoder.vq2emb(indices)
        return self.decoder.decode(emb)
