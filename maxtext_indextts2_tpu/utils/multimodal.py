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


# ------------------------------------------------------------------ family
# Per-family preprocessing + prompt conventions (reference:
# multimodal_utils.py pre_process_gemma3_image:318, pre_process_llama4_image
# :336, reformat_prompt:413, get_tokens_for_this_image:507).

GEMMA3_IMAGE_SIZE = 896
GEMMA3_TOKENS_PER_IMAGE = 256
LLAMA4_TILE_SIZE = 336
LLAMA4_MAX_TILES = 16
LLAMA4_PATCHES_PER_TILE = 144  # (336/14)^2 / 4 pixel-shuffle


def supported_tile_grids(max_tiles: int = LLAMA4_MAX_TILES) -> list[tuple[int, int]]:
    """All (rows, cols) grids with rows*cols <= max_tiles (llama4's
    candidate canvases; reference find_supported_resolutions:151)."""
    grids = []
    for n in range(1, max_tiles + 1):
        for rows in range(1, n + 1):
            if n % rows == 0:
                grids.append((rows, n // rows))
    return sorted(set(grids))


def best_tile_grid(height: int, width: int,
                   tile: int = LLAMA4_TILE_SIZE,
                   max_tiles: int = LLAMA4_MAX_TILES) -> tuple[int, int]:
    """Pick the tile grid whose canvas best fits the image (reference
    get_best_resolution:170): prefer canvases the image fits into WITHOUT
    downscaling (scale >= 1, least upscaling wins); otherwise the largest
    downscale. Ties: fewer wasted pixels, then fewer tiles."""
    best = None
    for rows, cols in supported_tile_grids(max_tiles):
        ch, cw = rows * tile, cols * tile
        scale = min(ch / height, cw / width)
        eff_h, eff_w = height * scale, width * scale
        waste = ch * cw - eff_h * eff_w
        # scale >= 1 sorts ahead (False < True reversed via 0/1), then the
        # scale distance from 1 in the preferred direction
        key = (0 if scale >= 1 else 1,
               scale if scale >= 1 else -scale,
               waste, rows * cols)
        if best is None or key < best[0]:
            best = (key, (rows, cols))
    return best[1]


def preprocess_image_gemma3(image) -> jax.Array:
    """gemma3: single 896x896 bilinear resize, SigLIP [-1,1] normalize.
    Returns [1, 896, 896, 3]."""
    return preprocess_image(
        image, ImagePreprocessConfig(image_size=GEMMA3_IMAGE_SIZE, num_tiles=1)
    )


def preprocess_image_llama4(image) -> tuple[jax.Array, tuple[int, int]]:
    """llama4: aspect-ratio best-fit tiling at 336px + a global thumbnail
    when tiled. Returns ([n_tiles(+1), 336, 336, 3], (rows, cols))."""
    img = jnp.asarray(image)
    if img.dtype == jnp.uint8:
        img = img.astype(jnp.float32) / 255.0
    h, w = img.shape[0], img.shape[1]
    rows, cols = best_tile_grid(h, w)
    s = LLAMA4_TILE_SIZE
    canvas = jax.image.resize(img, (rows * s, cols * s, 3), method="bilinear")
    tiles = (
        canvas.reshape(rows, s, cols, s, 3)
        .transpose(0, 2, 1, 3, 4)
        .reshape(rows * cols, s, s, 3)
    )
    out = 2.0 * tiles - 1.0  # llama4: [0,1] -> [-1,1]
    if rows * cols > 1:
        glob = 2.0 * jax.image.resize(img, (s, s, 3), method="bilinear") - 1.0
        out = jnp.concatenate([out, glob[None]], axis=0)
    return out, (rows, cols)


def tokens_for_image(family: str, aspect_ratio: tuple[int, int] = (1, 1)) -> int:
    """Total image-token count one image expands to, incl. llama4's
    per-tile separator structure (reference get_num_tokens_for_this_image
    :566: per tile 1 separator + patches; plus begin/end + global tile)."""
    if family == "gemma3":
        # <start_of_image> ... 256 soft tokens ... <end_of_image> — the soft
        # tokens are what the embedding fusion replaces
        return GEMMA3_TOKENS_PER_IMAGE
    if family == "llama4":
        rows, cols = aspect_ratio
        n_tiles = rows * cols
        per_tile = LLAMA4_PATCHES_PER_TILE + 1  # tile separator token
        total = n_tiles * per_tile
        if n_tiles > 1:
            total += LLAMA4_PATCHES_PER_TILE + 1  # global thumbnail
        return total + 2  # image begin/end markers
    raise ValueError(f"unknown multimodal family: {family}")


def format_vision_prompt(prompt: str, family: str,
                         placeholder: str = "<image>") -> str:
    """Rewrite a generic prompt's image placeholder into the family's
    convention (reference reformat_prompt:413 / reformat_response:435)."""
    if family == "gemma3":
        body = prompt.replace(placeholder, "\n\n<start_of_image>\n\n")
        return f"<start_of_turn>user\n{body}<end_of_turn>\n<start_of_turn>model\n"
    if family == "llama4":
        body = prompt.replace(placeholder, "<|image|>")
        return (
            "<|begin_of_text|><|header_start|>user<|header_end|>\n\n"
            f"{body}<|eot|><|header_start|>assistant<|header_end|>\n\n"
        )
    raise ValueError(f"unknown multimodal family: {family}")
