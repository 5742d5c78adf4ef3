"""W2v-BERT-class conformer encoder (JAX/flax).

On-device replacement for the reference's torch semantic encoder
(reference: input_pipeline/maskgct/semantic_utils.py:11 build_semantic_model
loads facebook/w2v-bert-2.0 and taps hidden layer 17 at :92). The
architecture mirrors HF's Wav2Vec2BertModel so converted weights load 1:1:

- feature projection: LayerNorm(160) -> Dense(1024)
- N conformer layers: 0.5*FFN -> self-attn (Shaw relative_key bias, clip
  [-64, 8]) -> conv module (pointwise->GLU-> *causal* depthwise k=31 ->
  LN -> swish -> pointwise) -> 0.5*FFN -> final LN
- tap at ``output_layer`` (17), normalized by precomputed per-dim mean/std
  (reference: wav2vec2bert_stats.pt).
"""

from __future__ import annotations

from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class ConformerConfig:
    input_dim: int = 160
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_kernel_size: int = 31
    left_max_distance: int = 64
    right_max_distance: int = 8
    layer_norm_eps: float = 1e-5
    output_layer: int = 17  # tap layer for semantic features
    dtype: jnp.dtype = jnp.float32


class FeedForward(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.cfg
        x = nn.Dense(cfg.intermediate_size, dtype=cfg.dtype, name="intermediate_dense")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="output_dense")(x)
        return x


class RelPosSelfAttention(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        cfg = self.cfg
        b, s, _ = x.shape
        h, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        q = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="linear_q")(x).reshape(b, s, h, d)
        k = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="linear_k")(x).reshape(b, s, h, d)
        v = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="linear_v")(x).reshape(b, s, h, d)

        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k) / np.sqrt(d)

        # Shaw relative-position bias, distance clipped to [-left, right]
        num_pos = cfg.left_max_distance + cfg.right_max_distance + 1
        dist_emb = self.param(
            "distance_embedding",
            nn.initializers.normal(0.02),
            (num_pos, d),
            jnp.float32,
        )
        dist = jnp.arange(s)[None, :] - jnp.arange(s)[:, None]  # key - query
        dist = jnp.clip(dist, -cfg.left_max_distance, cfg.right_max_distance)
        pe = jnp.take(dist_emb, dist + cfg.left_max_distance, axis=0)  # [S,S,d]
        rel = jnp.einsum("bqhd,qkd->bhqk", q, pe.astype(q.dtype)) / np.sqrt(d)
        scores = scores + rel

        if pad_mask is not None:
            scores = jnp.where(pad_mask[:, None, None, :], scores, -1e9)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, cfg.hidden_size)
        return nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="linear_out")(out)


class ConvModule(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        cfg = self.cfg
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm")(x)
        if pad_mask is not None:
            x = jnp.where(pad_mask[..., None], x, 0.0)
        # pointwise conv 1 (-> 2*hidden) + GLU
        x = nn.Dense(2 * cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                     name="pointwise_conv1")(x)
        a, g = jnp.split(x, 2, axis=-1)
        x = a * jax.nn.sigmoid(g)
        # causal depthwise conv, kernel 31, left-padded
        x = jnp.pad(x, ((0, 0), (cfg.conv_kernel_size - 1, 0), (0, 0)))
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.conv_kernel_size,),
            feature_group_count=cfg.hidden_size,
            padding="VALID",
            use_bias=False,
            dtype=cfg.dtype,
            name="depthwise_conv",
        )(x)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="depthwise_layer_norm")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(cfg.hidden_size, use_bias=False, dtype=cfg.dtype,
                     name="pointwise_conv2")(x)
        return x


class ConformerLayer(nn.Module):
    cfg: ConformerConfig

    @nn.compact
    def __call__(self, x, pad_mask):
        cfg = self.cfg
        ln = lambda name: nn.LayerNorm(epsilon=cfg.layer_norm_eps, name=name)
        x = x + 0.5 * FeedForward(cfg, name="ffn1")(ln("ffn1_layer_norm")(x))
        x = x + RelPosSelfAttention(cfg, name="self_attn")(ln("self_attn_layer_norm")(x), pad_mask)
        x = x + ConvModule(cfg, name="conv_module")(x, pad_mask)
        x = x + 0.5 * FeedForward(cfg, name="ffn2")(ln("ffn2_layer_norm")(x))
        return ln("final_layer_norm")(x)


class ConformerEncoder(nn.Module):
    """Returns all hidden states; the semantic tap selects one layer."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, pad_mask=None, output_layer: int | None = None):
        cfg = self.cfg
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="fp_layer_norm")(feats)
        x = nn.Dense(cfg.hidden_size, dtype=cfg.dtype, name="fp_projection")(x)
        n = output_layer if output_layer is not None else cfg.output_layer
        for i in range(min(n, cfg.num_layers)):
            x = ConformerLayer(cfg, name=f"layers_{i}")(x, pad_mask)
        return x


def config_from_hf_state_dict(state_dict, output_layer: int = 17) -> ConformerConfig:
    """Infer a ConformerConfig from a HF Wav2Vec2BertModel state dict.

    Every field is recoverable from weight shapes: head count via the
    relative-position ``distance_embedding`` (rows = left+right+1, cols =
    head_dim); the left/right split itself is not, so the w2v-bert-2.0
    convention (right=8, semantic_utils.py's checkpoint) is assumed.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    proj = sd["feature_projection.projection.weight"]  # [hidden, input]
    hidden, input_dim = proj.shape
    num_layers = 0
    while f"encoder.layers.{num_layers}.final_layer_norm.weight" in sd:
        num_layers += 1
    dist = sd["encoder.layers.0.self_attn.distance_embedding.weight"]
    head_dim = dist.shape[1]
    right = 8 if dist.shape[0] > 9 else 1
    left = dist.shape[0] - 1 - right
    return ConformerConfig(
        input_dim=input_dim,
        hidden_size=hidden,
        num_layers=num_layers,
        num_heads=hidden // head_dim,
        intermediate_size=sd["encoder.layers.0.ffn1.intermediate_dense.weight"].shape[0],
        conv_kernel_size=sd["encoder.layers.0.conv_module.depthwise_conv.weight"].shape[-1],
        left_max_distance=left,
        right_max_distance=right,
        output_layer=min(output_layer, num_layers),
    )


def params_from_hf(state_dict, cfg: ConformerConfig,
                   stat_mean=None, stat_std=None):
    """Convert a HF ``Wav2Vec2BertModel`` state dict (name -> array; torch
    tensors or numpy both fine) into ``SemanticEncoder`` params.

    Reference: semantic_utils.py:11 loads facebook/w2v-bert-2.0 with torch;
    here the same weights run on-device. ``stat_mean``/``stat_std`` are the
    layer-17 normalization stats (reference wav2vec2bert_stats.pt); default
    identity.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def dense(prefix, bias=True):
        p = {"kernel": sd[f"{prefix}.weight"].T}
        if bias:
            p["bias"] = sd[f"{prefix}.bias"]
        return p

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    sd_layers = 0
    while f"encoder.layers.{sd_layers}.final_layer_norm.weight" in sd:
        sd_layers += 1
    if sd_layers < cfg.num_layers:
        raise ValueError(
            f"state dict has {sd_layers} encoder layers but the config wants "
            f"{cfg.num_layers} — incomplete checkpoint (layers beyond the "
            f"checkpoint would stay random and silently corrupt the tap)"
        )
    # sd_layers > cfg.num_layers is fine: truncating at the tap layer
    # (output_layer) skips compute the semantic path never uses.

    enc = {
        "fp_layer_norm": ln("feature_projection.layer_norm"),
        "fp_projection": dense("feature_projection.projection"),
    }
    for i in range(cfg.num_layers):
        hf = f"encoder.layers.{i}"
        enc[f"layers_{i}"] = {
            "ffn1_layer_norm": ln(f"{hf}.ffn1_layer_norm"),
            "ffn1": {
                "intermediate_dense": dense(f"{hf}.ffn1.intermediate_dense"),
                "output_dense": dense(f"{hf}.ffn1.output_dense"),
            },
            "self_attn_layer_norm": ln(f"{hf}.self_attn_layer_norm"),
            "self_attn": {
                "linear_q": dense(f"{hf}.self_attn.linear_q"),
                "linear_k": dense(f"{hf}.self_attn.linear_k"),
                "linear_v": dense(f"{hf}.self_attn.linear_v"),
                "linear_out": dense(f"{hf}.self_attn.linear_out"),
                "distance_embedding": sd[f"{hf}.self_attn.distance_embedding.weight"],
            },
            "conv_module": {
                "layer_norm": ln(f"{hf}.conv_module.layer_norm"),
                # HF Conv1d [out, in, 1] -> flax Dense kernel [in, out]
                "pointwise_conv1": {
                    "kernel": sd[f"{hf}.conv_module.pointwise_conv1.weight"][:, :, 0].T
                },
                # HF depthwise [C, 1, K] -> flax Conv kernel [K, 1, C]
                "depthwise_conv": {
                    "kernel": sd[f"{hf}.conv_module.depthwise_conv.weight"].transpose(2, 1, 0)
                },
                "depthwise_layer_norm": ln(f"{hf}.conv_module.depthwise_layer_norm"),
                "pointwise_conv2": {
                    "kernel": sd[f"{hf}.conv_module.pointwise_conv2.weight"][:, :, 0].T
                },
            },
            "ffn2_layer_norm": ln(f"{hf}.ffn2_layer_norm"),
            "ffn2": {
                "intermediate_dense": dense(f"{hf}.ffn2.intermediate_dense"),
                "output_dense": dense(f"{hf}.ffn2.output_dense"),
            },
            "final_layer_norm": ln(f"{hf}.final_layer_norm"),
        }
    h = cfg.hidden_size
    return {"params": jax.tree.map(jnp.asarray, {
        "encoder": enc,
        "stat_mean": np.zeros(h, np.float32) if stat_mean is None else np.asarray(stat_mean),
        "stat_std": np.ones(h, np.float32) if stat_std is None else np.asarray(stat_std),
    })}


class SemanticEncoder(nn.Module):
    """w2v-bert tap + precomputed mean/std normalization
    (reference: semantic_utils.py:72 extract_semantic_code)."""

    cfg: ConformerConfig

    @nn.compact
    def __call__(self, feats, pad_mask=None):
        x = ConformerEncoder(self.cfg, name="encoder")(feats, pad_mask)
        mean = self.param("stat_mean", nn.initializers.zeros, (self.cfg.hidden_size,), jnp.float32)
        std = self.param("stat_std", nn.initializers.ones, (self.cfg.hidden_size,), jnp.float32)
        return (x - mean) / jnp.maximum(std, 1e-6)
