"""Multimodal preprocessing: image normalization, tiling, token fusion.

Reference: MaxText/multimodal_utils.py (787 LoC — per-family image
preprocessing and vision-token insertion for gemma3/llama4). TPU-first
choices: all resizing is jax.image on-device (bilinear, static output
shapes), tiling is a reshape (no python loops over tiles), and token fusion
builds static-shape sequences with an image-token mask rather than dynamic
insertion.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

# SigLIP-style normalization used by the gemma3 tower; llama4 uses plain
# [0,1] -> [-1,1].
_SIGLIP_MEAN = (0.5, 0.5, 0.5)
_SIGLIP_STD = (0.5, 0.5, 0.5)


@dataclasses.dataclass(frozen=True)
class ImagePreprocessConfig:
    image_size: int = 224  # square model input
    num_tiles: int = 1  # llama4-style tiling: split into t x t tiles + global
    mean: tuple = _SIGLIP_MEAN
    std: tuple = _SIGLIP_STD


def preprocess_image(
    image: jax.Array | np.ndarray,  # [H, W, 3] uint8 or float
    cfg: ImagePreprocessConfig = ImagePreprocessConfig(),
) -> jax.Array:
    """uint8 HWC image -> [num_tiles^2 (+1 global if tiling), S, S, 3] f32.

    With num_tiles == 1 returns [1, S, S, 3]."""
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    img = img.astype(jnp.float32)
    s = cfg.image_size
    mean = jnp.asarray(cfg.mean, jnp.float32)
    std = jnp.asarray(cfg.std, jnp.float32)

    def norm(x):
        return (x - mean) / std

    if cfg.num_tiles <= 1:
        out = jax.image.resize(img, (s, s, 3), method="bilinear")
        return norm(out)[None]

    t = cfg.num_tiles
    big = jax.image.resize(img, (s * t, s * t, 3), method="bilinear")
    tiles = big.reshape(t, s, t, s, 3).transpose(0, 2, 1, 3, 4).reshape(t * t, s, s, 3)
    glob = jax.image.resize(img, (s, s, 3), method="bilinear")
    return norm(jnp.concatenate([tiles, glob[None]], axis=0))


def insert_image_tokens(
    text_tokens: np.ndarray,  # [S] int32 with `image_placeholder_id` markers
    image_placeholder_id: int,
    tokens_per_image: int,
    image_token_id: int,
    max_length: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Expand each placeholder into `tokens_per_image` image-token slots.

    Returns (tokens [max_length], image_mask [max_length] bool). Static
    output shape: the sequence is truncated/padded to max_length so the
    result feeds a jit'd step directly (reference token fusion:
    multimodal_utils.py; dynamic insertion there happens on host too)."""
    out, mask = [], []
    for tok in text_tokens.tolist():
        if tok == image_placeholder_id:
            out.extend([image_token_id] * tokens_per_image)
            mask.extend([True] * tokens_per_image)
        else:
            out.append(tok)
            mask.append(False)
    out = out[:max_length]
    mask = mask[:max_length]
    pad = max_length - len(out)
    return (
        np.asarray(out + [0] * pad, np.int32),
        np.asarray(mask + [False] * pad, np.bool_),
    )


def fuse_vision_embeddings(
    token_embeddings: jax.Array,  # [B, S, E]
    vision_embeddings: jax.Array,  # [B, N_img_tokens, E]
    image_mask: jax.Array,  # [B, S] bool, exactly N_img_tokens True per row
) -> jax.Array:
    """Place vision embeddings at the masked positions (static shapes).

    TPU-native: a cumulative-rank gather instead of a scatter — each masked
    position i takes vision row rank(i); unmasked rows keep their token
    embedding. One where + one take_along_axis, no serialized scatter."""
    rank = jnp.cumsum(image_mask.astype(jnp.int32), axis=1) - 1
    rank = jnp.clip(rank, 0, vision_embeddings.shape[1] - 1)
    gathered = jnp.take_along_axis(
        vision_embeddings, rank[..., None], axis=1
    )
    return jnp.where(image_mask[..., None], gathered, token_embeddings)
