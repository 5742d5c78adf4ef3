"""Vision encoder + multimodal token fusion.

Reference: MaxText/layers/encoders.py:28 VisionEncoder (gemma3/llama4 vision
towers) + multimodal_utils.py token fusion. One compact ViT covers the
capability: conv patchify -> pre-LN transformer blocks -> pooled/projected
image embeddings, merged into the decoder's token stream at image
placeholder positions.
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.models.attention import dot_product_attention


@dataclass(frozen=True)
class VisionConfig:
    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_dim: int = 3072
    output_dim: int = 2048  # decoder emb_dim (0 = no projector, raw tower output)
    pool_stride: int = 4  # output tokens = (patches/stride^2)
    dtype: jnp.dtype = jnp.bfloat16


class ViTBlock(nn.Module):
    cfg: VisionConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        b, s, e = x.shape
        h = nn.LayerNorm(name="ln1")(x)
        qkv = nn.Dense(3 * e, dtype=cfg.dtype, name="qkv")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        d = e // cfg.num_heads
        q = q.reshape(b, s, cfg.num_heads, d)
        k = k.reshape(b, s, cfg.num_heads, d)
        v = v.reshape(b, s, cfg.num_heads, d)
        attn = dot_product_attention(q, k, v, None).reshape(b, s, e)
        x = x + nn.Dense(e, dtype=cfg.dtype, name="proj")(attn)
        h = nn.LayerNorm(name="ln2")(x)
        h = nn.Dense(cfg.mlp_dim, dtype=cfg.dtype, name="fc1")(h)
        h = jax.nn.gelu(h)
        return x + nn.Dense(e, dtype=cfg.dtype, name="fc2")(h)


class VisionEncoder(nn.Module):
    cfg: VisionConfig

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """[B, H, W, 3] -> [B, num_image_tokens, output_dim]."""
        cfg = self.cfg
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            dtype=cfg.dtype,
            name="patch_embed",
        )(images.astype(cfg.dtype))
        b, hp, wp, e = x.shape
        x = x.reshape(b, hp * wp, e)
        pos = self.param(
            "pos_embedding", nn.initializers.normal(0.02), (1, hp * wp, e), jnp.float32
        )
        x = x + pos.astype(cfg.dtype)
        for i in range(cfg.num_layers):
            x = ViTBlock(cfg, name=f"block_{i}")(x)
        x = nn.LayerNorm(name="final_ln")(x)
        # spatial average-pool to reduce image token count (gemma3-style)
        if cfg.pool_stride > 1:
            s = cfg.pool_stride
            x = x.reshape(b, hp, wp, e)
            x = x[:, : hp // s * s, : wp // s * s].reshape(
                b, hp // s, s, wp // s, s, e
            ).mean(axis=(2, 4))
            x = x.reshape(b, -1, e)
        if cfg.output_dim <= 0:
            return x  # raw SigLIP tower output (parity-tested vs HF)
        return nn.Dense(cfg.output_dim, dtype=cfg.dtype, name="projector")(x)


def merge_vision_embeddings(
    token_embeddings: jax.Array,  # [B, S, E]
    vision_embeddings: jax.Array,  # [B, T_img, E]
    tokens: jax.Array,  # [B, S]
    image_token_id: int,
) -> jax.Array:
    """Replace embeddings at image-placeholder positions with vision tokens,
    in order (reference: multimodal_utils token fusion)."""
    is_img = tokens == image_token_id  # [B, S]
    # index of each image slot among the row's placeholders
    slot = jnp.cumsum(is_img.astype(jnp.int32), axis=1) - 1
    slot = jnp.clip(slot, 0, vision_embeddings.shape[1] - 1)
    gathered = jnp.take_along_axis(
        vision_embeddings, slot[..., None], axis=1
    )
    return jnp.where(is_img[..., None], gathered.astype(token_embeddings.dtype),
                     token_embeddings)


class Gemma3MultiModalProjector(nn.Module):
    """SigLIP patch grid -> mm_tokens_per_image soft tokens.

    Average-pool the patch grid down to tokens_per_side^2, RMS-normalize
    (gemma (1+w) convention), then project into the text embedding space
    (reference: HF Gemma3MultiModalProjector, modeling_gemma3.py:693)."""

    vision_hidden: int
    text_hidden: int
    patches_per_side: int
    tokens_per_side: int
    eps: float = 1e-6

    @nn.compact
    def __call__(self, vision_outputs: jax.Array) -> jax.Array:
        from maxtext_indextts2_tpu.models.layers import RMSNorm

        b, s, e = vision_outputs.shape
        p, t = self.patches_per_side, self.tokens_per_side
        k = p // t
        x = vision_outputs.reshape(b, p, p, e)
        x = x.reshape(b, t, k, t, k, e).mean(axis=(2, 4)).reshape(b, t * t, e)
        x = RMSNorm(
            epsilon=self.eps, dtype=x.dtype, weight_dtype=jnp.float32,
            scale_plus_one=True, name="mm_soft_emb_norm",
        )(x)
        w = self.param(
            "mm_input_projection",
            nn.initializers.zeros,
            (self.vision_hidden, self.text_hidden),
            jnp.float32,
        )
        return (x @ w.astype(x.dtype)).astype(vision_outputs.dtype)


class Llama4VisionEncoder(nn.Module):
    """Llama4 vision tower (reference: HF modeling_llama4.py:1004
    Llama4VisionModel): unfold patch embed, CLS token appended at the END,
    learned positions, 2D rope inside bias-MHA pre-LN blocks (exact-erf
    GELU MLP), then a pixel-shuffle MLP adapter. Output: per-image soft
    patches [B, (p*ratio)^2, projector_output_dim]."""

    image_size: int
    patch_size: int
    hidden_size: int
    num_layers: int
    num_heads: int
    intermediate_size: int
    projector_input_dim: int
    projector_output_dim: int
    pixel_shuffle_ratio: float = 0.5
    rope_theta: float = 10000.0
    dtype: jnp.dtype = jnp.float32

    def _freqs(self):
        """2D rope angles per (position incl CLS, head_dim/2) — complex
        rotation as (cos, sin). HF: x/y coords interleaved, CLS zeroed."""
        idx = self.image_size // self.patch_size
        n = idx * idx
        hd = self.hidden_size // self.num_heads
        freq_dim = hd // 2
        pos = np.arange(n, dtype=np.int64)
        fx = (pos % idx).astype(np.float32)
        fy = (pos // idx).astype(np.float32)
        rope_freq = 1.0 / (
            self.rope_theta
            ** (np.arange(0, freq_dim, 2)[: freq_dim // 2].astype(np.float32) / freq_dim)
        )
        freqs_x = np.repeat((fx + 1)[:, None] * rope_freq[None, :], 2, axis=-1)
        freqs_y = np.repeat((fy + 1)[:, None] * rope_freq[None, :], 2, axis=-1)
        freqs = np.concatenate([freqs_x, freqs_y], axis=-1)[:, ::2]  # [n, hd/2]
        freqs = np.concatenate([freqs, np.zeros((1, freqs.shape[1]), np.float32)])
        return jnp.cos(freqs), jnp.sin(freqs)  # [n+1, hd/2] each

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        b = images.shape[0]
        p, s = self.patch_size, self.image_size
        hp = s // p
        e = self.hidden_size
        # unfold: per-patch features flattened channel-major (torch Unfold)
        x = images.astype(self.dtype).reshape(b, hp, p, hp, p, 3)
        x = x.transpose(0, 1, 3, 5, 2, 4).reshape(b, hp * hp, 3 * p * p)
        x = nn.Dense(e, use_bias=False, dtype=self.dtype, name="patch_embed")(x)

        cls = self.param("class_embedding", nn.initializers.normal(e**-0.5), (e,), jnp.float32)
        x = jnp.concatenate(
            [x, jnp.broadcast_to(cls.astype(self.dtype), (b, 1, e))], axis=1
        )
        pos = self.param(
            "positional_embedding_vlm", nn.initializers.normal(e**-0.5),
            (hp * hp + 1, e), jnp.float32,
        )
        x = x + pos.astype(self.dtype)
        x = nn.LayerNorm(name="layernorm_pre")(x)

        cos, sin = self._freqs()

        def rope2d(t):  # [B, S, H, hd] complex-pair rotation
            tr = t.reshape(t.shape[:-1] + (-1, 2))
            tre, tim = tr[..., 0], tr[..., 1]
            c = cos[None, :, None, :]
            sn = sin[None, :, None, :]
            out_re = tre * c - tim * sn
            out_im = tre * sn + tim * c
            return jnp.stack([out_re, out_im], axis=-1).reshape(t.shape).astype(t.dtype)

        hd = e // self.num_heads
        for i in range(self.num_layers):
            h = nn.LayerNorm(name=f"ln1_{i}")(x)
            q = nn.Dense(e, dtype=self.dtype, name=f"q_{i}")(h).reshape(b, -1, self.num_heads, hd)
            k = nn.Dense(e, dtype=self.dtype, name=f"k_{i}")(h).reshape(b, -1, self.num_heads, hd)
            v = nn.Dense(e, dtype=self.dtype, name=f"v_{i}")(h).reshape(b, -1, self.num_heads, hd)
            q, k = rope2d(q), rope2d(k)
            attn = dot_product_attention(q, k, v, None).reshape(b, -1, e)
            x = x + nn.Dense(e, dtype=self.dtype, name=f"o_{i}")(attn)
            h = nn.LayerNorm(name=f"ln2_{i}")(x)
            h = nn.Dense(self.intermediate_size, dtype=self.dtype, name=f"fc1_{i}")(h)
            h = jax.nn.gelu(h, approximate=False)
            x = x + nn.Dense(e, dtype=self.dtype, name=f"fc2_{i}")(h)

        x = nn.LayerNorm(name="layernorm_post")(x)
        x = x[:, :-1]  # drop CLS

        # pixel shuffle (HF pixel_shuffle, ratio < 1 trades space for channels)
        r = self.pixel_shuffle_ratio
        n = x.shape[1]
        g = int(np.sqrt(n))
        c = x.shape[-1]
        t = x.reshape(b, g, g, c)
        t = t.reshape(b, g, int(g * r), int(c / r)).transpose(0, 2, 1, 3)
        t = t.reshape(b, int(g * r), int(g * r), int(c / (r * r))).transpose(0, 2, 1, 3)
        x = t.reshape(b, -1, int(c / (r * r)))

        h = nn.Dense(self.projector_input_dim, use_bias=False, dtype=self.dtype,
                     name="adapter_fc1")(x)
        h = jax.nn.gelu(h, approximate=False)
        h = nn.Dense(self.projector_output_dim, use_bias=False, dtype=self.dtype,
                     name="adapter_fc2")(h)
        return jax.nn.gelu(h, approximate=False)
