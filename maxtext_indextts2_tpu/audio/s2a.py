"""MaskGCT semantic->acoustic (S2A) masked generative transformer, in JAX.

Counterpart of reference maskgct/s2a/maskgct_s2a.py (MaskGCT_S2A:35,
forward_diffusion:186, compute_loss:272, reverse_diffusion:318) and
llama_nar.py (DiffLlama:130, LlamaAdaptiveRMSNorm:35, SinusoidalPosEmb:20).

TPU-first design notes:
- The iterative sampler is FULLY jit-compatible: per-layer step schedules are
  static python ints, so the confidence-re-masking counts
  (sin-schedule * seq_len) are static top-k sizes — no data-dependent shapes
  (the reference's sampler breaks out of python loops on tensor values and
  cannot be compiled).
- Per-quantizer embeddings/heads are stacked [Q, ...] arrays indexed by layer
  instead of Q separate modules — one HBM buffer, gather instead of python
  dispatch, and the layer loop stays unrolled (Q=12 is small).
- The denoiser is a non-causal llama block stack with adaptive RMSNorm
  conditioned on the diffusion timestep; attention runs through the shared
  flash kernel (causal=False) on TPU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclass(frozen=True)
class S2AConfig:
    num_quantizers: int = 12
    hidden_size: int = 1024
    num_layers: int = 16
    num_heads: int = 16
    codebook_size: int = 1024
    cond_codebook_size: int = 8192
    cfg_dropout: float = 0.15  # reference cfg_scale (train-time cond dropout)
    mask_layer_schedule: str = "cosine"
    predict_layer_1: bool = True
    dtype: jnp.dtype = jnp.float32
    # Serving-only: int8 x int8 matmuls in the denoiser's qkv/out/MLP
    # projections (per-token activation scales, per-channel weight scales).
    # The S2A pass is COMPUTE-bound (~49% of bf16 MXU peak, PERF.md "S2A
    # anatomy") and the v5e int8 MXU peak is 2x bf16 — this trades numerics
    # (int8 quantization error) for throughput.
    # "dynamic": weights quantized on the fly per call; param tree unchanged
    #   (an f32 checkpoint serves unmodified), but the per-step weight
    #   absmax+round costs ~2.4 GB HBM traffic per denoiser call.
    # "offline": params hold pre-quantized int8 kernels + kernel_scale —
    #   convert an f32 tree with ``quantize_s2a_params``; fastest.
    int8_matmul: str | bool = False  # False | "dynamic" (True) | "offline"


class Int8Dense(nn.Module):
    """Drop-in nn.Dense(use_bias=False) with symmetric int8 matmul.

    Dynamic mode keeps nn.Dense's param tree ("kernel" f32, lecun_normal) and
    absmax-quantizes both operands on the fly. Offline mode stores the kernel
    as int8 with a per-output-channel "kernel_scale" (produced by
    ``quantize_s2a_params``), so the hot loop only quantizes activations.
    The dot runs int8 x int8 -> int32 on the MXU (2x bf16 peak on v5e).
    """

    features: int
    offline: bool = False
    out_dtype: jnp.dtype | None = None  # required when called pre-quantized

    @nn.compact
    def __call__(self, x, xq=None, xs=None):
        """x: float input, OR (xq int8 [..., K], xs f32 [...]) pre-quantized
        by a producer-fused kernel (ops/quant_kernels.py)."""
        in_features = (x if xq is None else xq).shape[-1]
        if self.offline:
            wq = self.param(
                "kernel",
                lambda key, shape, dtype: jnp.zeros(shape, dtype),
                (in_features, self.features),
                jnp.int8,
            )
            ws = self.param(
                "kernel_scale", nn.initializers.ones, (1, self.features),
                jnp.float32,
            )
        else:
            kernel = self.param(
                "kernel",
                nn.initializers.lecun_normal(),
                (in_features, self.features),
                jnp.float32,
            )
            wf = kernel.astype(jnp.float32)
            ws = jnp.max(jnp.abs(wf), axis=0, keepdims=True) / 127.0
            wq = jnp.round(wf / jnp.maximum(ws, 1e-9)).astype(jnp.int8)
        if xq is not None:
            out_dtype = self.out_dtype or jnp.float32
            xs = xs[..., None]
        else:
            out_dtype = x.dtype
            if _fused_quant_ok(x):
                # one-pass absmax+round Pallas kernel with compact [B,S]
                # scales (the jnp path re-reads x and lane-pads the
                # [rows,1] scale 128x)
                from maxtext_indextts2_tpu.ops.quant_kernels import row_quantize_int8

                xq, xs2 = row_quantize_int8(x)
                xs = xs2[..., None]
            else:
                xf = x.astype(jnp.float32)
                xs = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
                xq = jnp.round(xf / jnp.maximum(xs, 1e-9)).astype(jnp.int8)
        acc = jax.lax.dot_general(
            xq, wq, (((xq.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * xs * ws).astype(out_dtype)


def _fused_quant_ok(x) -> bool:
    import os

    return (
        os.environ.get("MTT_FUSED_QUANT", "1") == "1"
        and jax.default_backend() == "tpu"
        and x.ndim == 3
        and x.shape[-1] % 128 == 0
    )


def _dense(cfg: S2AConfig, features: int, name: str):
    if cfg.int8_matmul:
        return Int8Dense(features, offline=cfg.int8_matmul == "offline", name=name)
    return nn.Dense(features, use_bias=False, name=name)


def serving_s2a_config(base: S2AConfig, serving_dtype: str) -> S2AConfig:
    """Apply Config.s2a_serving_dtype to an S2AConfig."""
    import dataclasses

    if serving_dtype in ("", "float32"):
        return base
    if serving_dtype == "bfloat16":
        return dataclasses.replace(base, dtype=jnp.bfloat16)
    if serving_dtype == "int8":
        return dataclasses.replace(base, dtype=jnp.bfloat16, int8_matmul="dynamic")
    if serving_dtype == "int8_offline":
        return dataclasses.replace(base, dtype=jnp.bfloat16, int8_matmul="offline")
    raise ValueError(f"unknown s2a_serving_dtype: {serving_dtype}")


def cast_denoiser_params(params, dtype=jnp.bfloat16):
    """Cast the denoiser subtree's float params to ``dtype`` (serve-time).

    Embeddings/logit heads stay f32 (they feed f32 embedding sums / logits),
    int8 kernels and their f32 ``kernel_scale`` are left untouched.
    Pre-casting once avoids flax's per-call weight recast inside the sampler
    scan (the reason dynamic bf16 activations measured SLOWER, PERF.md) and
    keeps the residual stream in ``dtype`` (flax dtype promotion).
    """

    def cast(path, x):
        if any(getattr(k, "key", None) == "kernel_scale" for k in path):
            return x
        return x.astype(dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x

    out = jax.tree.map(lambda x: x, params)  # shallow copy
    p = out["params"] if "params" in out else out
    p["denoiser"] = jax.tree_util.tree_map_with_path(cast, p["denoiser"])
    return out


def quantize_s2a_params(params, model, example_args):
    """Convert an f32-trained S2A params tree for int8_matmul="offline".

    ``model`` is an S2AModel built with int8_matmul="offline";
    ``example_args`` the (x0, x_mask, cond_code, rng) init args. Kernels that
    the offline model expects as int8 are absmax-quantized per output channel
    (same convention as ops.quantization.quantize_params_for_serving).
    """
    import functools

    from maxtext_indextts2_tpu.ops.quantization import quantize_params_for_serving

    abstract = jax.eval_shape(
        functools.partial(model.init, jax.random.PRNGKey(0)), *example_args
    )
    return quantize_params_for_serving(params, abstract)


def sinusoidal_time_emb(t: jax.Array, dim: int) -> jax.Array:
    """[B] in [0,1] -> [B, dim] (reference: llama_nar.py:20)."""
    half = dim // 2
    freqs = jnp.exp(jnp.arange(half) * (-math.log(10000.0) / (half - 1)))
    ang = t[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)


class AdaptiveRMSNorm(nn.Module):
    """RMSNorm with scale predicted from a conditioning vector
    (reference: llama_nar.py:35 — zero-init weight, ones bias).

    ``quantize_out=True`` returns (int8 rows, [B,S] scales) instead of the
    float output — fused with the quantization of the consuming Int8Dense
    so the normalized tensor never round-trips HBM (int8 serving only).
    """

    dim: int

    @nn.compact
    def __call__(self, x, cond, quantize_out: bool = False):
        weight = nn.Dense(
            self.dim,
            kernel_init=nn.initializers.zeros,
            bias_init=nn.initializers.ones,
            name="to_weight",
        )(cond)
        import os

        on_tpu_3d = (
            jax.default_backend() == "tpu"
            and x.ndim == 3
            and weight.ndim == 2
            and x.shape[-1] % 128 == 0
        )
        if quantize_out:
            if on_tpu_3d and os.environ.get("MTT_FUSED_QUANT", "1") == "1":
                from maxtext_indextts2_tpu.ops.quant_kernels import (
                    ada_rmsnorm_quantize,
                )

                return ada_rmsnorm_quantize(x, weight)
            y = self._unfused(x, weight)
            yf = y.astype(jnp.float32)
            xs = jnp.max(jnp.abs(yf), axis=-1) / 127.0
            xq = jnp.round(yf / jnp.maximum(xs[..., None], 1e-9)).astype(jnp.int8)
            return xq, xs
        if on_tpu_3d and os.environ.get("MTT_FUSED_ADALN", "1") == "1":
            # fused Pallas path: the unfused variance reduce alone is ~17x
            # off HBM SoL and 22% of the S2A pass (PERF.md "S2A anatomy")
            from maxtext_indextts2_tpu.ops.ada_rmsnorm import ada_rmsnorm

            return ada_rmsnorm(x, weight)
        return self._unfused(x, weight)

    @staticmethod
    def _unfused(x, weight):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + 1e-6).astype(x.dtype)
        if weight.ndim == 2:
            weight = weight[:, None, :]
        return normed * weight.astype(x.dtype)


class NARBlock(nn.Module):
    cfg: S2AConfig

    @nn.compact
    def __call__(self, x, t_cond, pad_mask, all_valid: bool = False):
        cfg = self.cfg
        if cfg.int8_matmul:
            # producer-fused quantization: the AdaLN outputs feed straight
            # into int8 matmuls as (int8, scales) — the normalized float
            # tensors never hit HBM (ops/quant_kernels.py).
            hq, hs = AdaptiveRMSNorm(cfg.hidden_size, name="input_norm")(
                x, t_cond, quantize_out=True
            )
            h = _self_attention(
                None, pad_mask, cfg, all_valid, xq=hq, xs=hs, out_dtype=x.dtype
            )
            x = x + h
            hq, hs = AdaptiveRMSNorm(cfg.hidden_size, name="post_attn_norm")(
                x, t_cond, quantize_out=True
            )
            h = _swiglu_mlp(None, cfg, xq=hq, xs=hs, out_dtype=x.dtype)
            return x + h
        h = AdaptiveRMSNorm(cfg.hidden_size, name="input_norm")(x, t_cond)
        h = _self_attention(h, pad_mask, cfg, all_valid)
        x = x + h
        h = AdaptiveRMSNorm(cfg.hidden_size, name="post_attn_norm")(x, t_cond)
        h = _swiglu_mlp(h, cfg)
        return x + h


def _self_attention(
    x, pad_mask, cfg: S2AConfig, all_valid: bool = False,
    xq=None, xs=None, out_dtype=None,
):
    import os

    b, s, _ = (x if xq is None else xq).shape
    n, d = cfg.num_heads, cfg.hidden_size // cfg.num_heads
    if xq is not None:
        qkv = Int8Dense(
            3 * cfg.hidden_size, offline=cfg.int8_matmul == "offline",
            out_dtype=out_dtype, name="qkv",
        )(None, xq=xq, xs=xs)
        x = jnp.zeros((b, s, 0), out_dtype)  # only .dtype is used below
    else:
        qkv = _dense(cfg, 3 * cfg.hidden_size, "qkv")(x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, n, d)
    k = k.reshape(b, s, n, d)
    v = v.reshape(b, s, n, d)

    from maxtext_indextts2_tpu.models.rope import apply_rope, rope_frequencies

    pos = jnp.broadcast_to(jnp.arange(s, dtype=jnp.int32)[None], (b, s))
    inv = rope_frequencies(d)
    # rotate-half pairing: the reference DiffLlama is built from HF
    # LlamaDecoderLayer (llama_nar.py:56), whose RoPE is rotate_half — and
    # the interleaved form costs ~300 ms/pass in stride-2 lane relayouts on
    # TPU (stack[...,32,2] copies; PERF.md "S2A anatomy").
    q = apply_rope(q, pos, inv, interleave=False)
    k = apply_rope(k, pos, inv, interleave=False)

    if (
        all_valid
        and os.environ.get("MTT_S2A_FLASH", "0") == "1"
        and jax.default_backend() == "tpu"
    ):
        # sampler-only fused kernel (opt-in; measured NEUTRAL-to-slower on
        # v5e — 2.86 vs 2.76 s/pass, see ops/s2a_attention.py docstring):
        # reverse_diffusion always runs with all-ones pad masks, so only the
        # static pad tail needs masking and the [B,N,S,S] logits never touch
        # HBM.
        from maxtext_indextts2_tpu.ops.s2a_attention import s2a_attention

        scale = 1.0 / math.sqrt(d)
        ad = jnp.bfloat16 if cfg.dtype == jnp.bfloat16 else x.dtype
        o = s2a_attention(
            (q * scale).astype(ad), k.astype(ad), v.astype(ad)
        ).astype(x.dtype).reshape(b, s, cfg.hidden_size)
        return _dense(cfg, cfg.hidden_size, "out")(o)

    # NOTE: flash attention is OPT-IN here (MTT_S2A_SEQ_FLASH=1) — measured
    # SLOWER than the materialized bf16 path at serving sizes in every form:
    # pad-to-256 4.58 vs 3.77 s/pass at s=650, and the automatic s%256==0
    # route made the tlen=512 uncond call 3.70 vs 2.44 s/pass (d=64 halves
    # MXU efficiency for the kernel; PERF.md "S2A anatomy" + "masked
    # bucketed pass"). Worth retrying only at multi-thousand-token sequences
    # where the [B,N,S,S] materialization becomes the bottleneck.
    if (
        jax.default_backend() == "tpu" and s >= 512 and s % 256 == 0
        and os.environ.get("MTT_S2A_SEQ_FLASH", "0") == "1"
    ):
        from maxtext_indextts2_tpu.ops.flash_attention import flash_attention

        seg = pad_mask.astype(jnp.int32)
        o = flash_attention(
            jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2), jnp.swapaxes(v, 1, 2),
            pos, pos, seg, seg, False, 0, 0, 0.0, None, 256, 256,
        )
        o = jnp.swapaxes(o, 1, 2).reshape(b, s, cfg.hidden_size)
    elif cfg.dtype == jnp.bfloat16:
        # bf16-stored logits with f32 softmax internals — the reference's
        # DiffLlama under torch bf16 autocast stores bf16 attention weights
        # the same way (HF Llama upcasts only the softmax). The f32 logits
        # buffer is the S2A pass's largest bandwidth item
        # ([B,N,S,S] x n_layers; PERF.md "S2A anatomy").
        scale = 1.0 / math.sqrt(d)
        qb = (q * scale).astype(jnp.bfloat16)
        kb = k.astype(jnp.bfloat16)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", qb, kb, preferred_element_type=jnp.bfloat16
        )
        logits = jnp.where(pad_mask[:, None, None, :] > 0, logits, -1e9)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(
            jnp.bfloat16
        )
        o = jnp.einsum(
            "bhqk,bkhd->bqhd", probs, v.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype).reshape(b, s, cfg.hidden_size)
    else:
        from maxtext_indextts2_tpu.models.attention import dot_product_attention

        mask = (pad_mask[:, None, None, :] > 0)
        o = dot_product_attention(q, k, v, mask).reshape(b, s, cfg.hidden_size)
    return _dense(cfg, cfg.hidden_size, "out")(o)


def _swiglu_mlp(x, cfg: S2AConfig, xq=None, xs=None, out_dtype=None):
    inner = cfg.hidden_size * 4
    if xq is not None:
        offline = cfg.int8_matmul == "offline"
        # one quantized input shared by gate and up; silu*up is quantized in
        # the producer kernel so the [.., 4*H] float product skips HBM
        g = Int8Dense(inner, offline=offline, out_dtype=out_dtype, name="gate")(
            None, xq=xq, xs=xs
        )
        u = Int8Dense(inner, offline=offline, out_dtype=out_dtype, name="up")(
            None, xq=xq, xs=xs
        )
        down = Int8Dense(
            cfg.hidden_size, offline=offline, out_dtype=out_dtype, name="down"
        )
        if _fused_quant_ok(g):
            from maxtext_indextts2_tpu.ops.quant_kernels import silu_mul_quantize

            dq, ds = silu_mul_quantize(g, u)
            return down(None, xq=dq, xs=ds)
        return down(jax.nn.silu(g) * u)
    g = _dense(cfg, inner, "gate")(x)
    u = _dense(cfg, inner, "up")(x)
    return _dense(cfg, cfg.hidden_size, "down")(jax.nn.silu(g) * u)


class NARDenoiser(nn.Module):
    """Non-causal llama-style denoiser (reference DiffLlama)."""

    cfg: S2AConfig

    @nn.compact
    def __call__(self, x, t, cond, pad_mask, all_valid: bool = False):
        cfg = self.cfg
        cond_emb = nn.Sequential(
            [nn.Dense(cfg.hidden_size * 4, name="c0"), jax.nn.silu,
             nn.Dense(cfg.hidden_size, name="c1")], name="cond_mlp",
        )(cond)
        t_emb = sinusoidal_time_emb(t, cfg.hidden_size)
        t_cond = nn.Sequential(
            [nn.Dense(cfg.hidden_size * 4, name="t0"), jax.nn.silu,
             nn.Dense(cfg.hidden_size, name="t1")], name="diff_step_mlp",
        )(t_emb)

        x = x + cond_emb
        for i in range(cfg.num_layers):
            x = NARBlock(cfg, name=f"layers_{i}")(x, t_cond, pad_mask, all_valid)
        return AdaptiveRMSNorm(cfg.hidden_size, name="final_norm")(x, t_cond)


class PrefixNARDenoiser(nn.Module):
    """Phone-conditioned prefix denoiser (reference DiffLlamaPrefix,
    llama_nar.py:355): the condition is MLP'd and CONCATENATED as an
    attention prefix (not added elementwise like DiffLlama); the output
    drops the prefix rows. ``use_phone_cond=False`` degenerates to an
    unconditional non-causal denoiser."""

    cfg: S2AConfig
    use_phone_cond: bool = True

    @nn.compact
    def __call__(self, x, t, phone_emb=None, x_mask=None, phone_mask=None,
                 all_valid: bool = False):
        cfg = self.cfg
        b, s, _ = x.shape
        if x_mask is None:
            x_mask = jnp.ones((b, s), jnp.int32)
        t_emb = sinusoidal_time_emb(t, cfg.hidden_size)
        t_cond = nn.Sequential(
            [nn.Dense(cfg.hidden_size * 4, name="t0"), jax.nn.silu,
             nn.Dense(cfg.hidden_size, name="t1")], name="diff_step_mlp",
        )(t_emb)

        p = 0
        pad_mask = x_mask
        if self.use_phone_cond and phone_emb is not None:
            cond = nn.Sequential(
                [nn.Dense(cfg.hidden_size * 4, name="c0"), jax.nn.silu,
                 nn.Dense(cfg.hidden_size, name="c1")], name="cond_mlp",
            )(phone_emb)
            p = cond.shape[1]
            if phone_mask is None:
                phone_mask = jnp.ones((b, p), jnp.int32)
            x = jnp.concatenate([cond.astype(x.dtype), x], axis=1)
            pad_mask = jnp.concatenate(
                [phone_mask.astype(x_mask.dtype), x_mask], axis=1
            )

        for i in range(cfg.num_layers):
            x = NARBlock(cfg, name=f"layers_{i}")(x, t_cond, pad_mask, all_valid)
        x = AdaptiveRMSNorm(cfg.hidden_size, name="final_norm")(x, t_cond)
        return x[:, p:]


def _kth_largest(x, k: int):
    """Exact k-th largest along the last axis, as [..., 1].

    Equivalent to ``lax.top_k(x, k)[0][..., -1:]`` but values-only and
    hierarchical: every global top-k element is inside its 128-wide chunk's
    top-k, so two narrow sorts replace one 1024-wide variadic (value, index)
    sort — the full sort was ~1.4 ms/step of the S2A pass (PERF.md profile).
    """
    v = x.shape[-1]
    c = 128
    if k >= c or v % c or v <= c:
        return jax.lax.top_k(x, k)[0][..., -1:]
    xr = x.reshape(*x.shape[:-1], v // c, c)
    # explicit width (not -1): reshape(-1) raises on zero-size inputs, and a
    # zero-length target (empty LM generation) must flow through like top_k
    cand = jnp.sort(xr, axis=-1)[..., c - k:].reshape(*x.shape[:-1], (v // c) * k)
    return jnp.sort(cand, axis=-1)[..., -k, None]


def mask_prob_schedule(t):
    """sin mask schedule (reference maskgct_s2a.py:139)."""
    return jnp.sin(t * jnp.pi / 2)


def _layer_weights(cfg: S2AConfig) -> np.ndarray:
    q = cfg.num_quantizers
    lo = 0 if cfg.predict_layer_1 else 1
    if cfg.mask_layer_schedule == "uniform":
        w = np.ones(q)
    elif cfg.mask_layer_schedule == "cosine":
        w = np.array([np.cos((i - lo) / q * np.pi / 2) for i in range(q)])
    else:  # linear
        w = np.array([q - (i - lo) for i in range(q)], dtype=np.float64)
    if lo == 1:
        w[0] = 0.0
    return (w / w.sum()).astype(np.float32)


class S2AModel(nn.Module):
    cfg: S2AConfig

    def setup(self):
        cfg = self.cfg
        init = nn.initializers.normal(0.02)
        self.layer_emb = self.param(
            "layer_emb", init, (cfg.num_quantizers, cfg.hidden_size), jnp.float32)
        self.mask_emb = self.param("mask_emb", init, (cfg.hidden_size,), jnp.float32)
        self.token_emb = self.param(
            "token_emb", init,
            (cfg.num_quantizers, cfg.codebook_size, cfg.hidden_size), jnp.float32)
        self.to_logits_w = self.param(
            "to_logits_w", init,
            (cfg.num_quantizers, cfg.hidden_size, cfg.codebook_size), jnp.float32)
        self.to_logits_b = self.param(
            "to_logits_b", nn.initializers.zeros,
            (cfg.num_quantizers, cfg.codebook_size), jnp.float32)
        self.cond_emb = self.param(
            "cond_emb", init, (cfg.cond_codebook_size, cfg.hidden_size), jnp.float32)
        self.denoiser = NARDenoiser(cfg, name="denoiser")

    # -------------------------------------------------------------- helpers
    def embed_tokens_upto(self, x0, n_layers: int):
        """sum_l token_emb[l][x0[..., l]] for l < n_layers. x0: [B,T,Q]."""
        out = 0.0
        for l in range(n_layers):
            out = out + jnp.take(self.token_emb[l], x0[..., l], axis=0)
        return out

    # ---------------------------------------------------------------- train
    def compute_loss(self, x0, x_mask, cond_code, rng):
        """x0: [B,T,Q] acoustic codes; x_mask: [B,T]; cond_code: [B,T] semantic.

        Returns (loss, aux). Reference: compute_loss:272 + forward_diffusion:186.
        """
        cfg = self.cfg
        b, tlen, q = x0.shape
        r_t, r_layer, r_mask, r_prompt, r_drop, r_plen = jax.random.split(rng, 6)

        t = jnp.clip(jax.random.uniform(r_t, (b,)), 1e-5, 1.0)
        mask_layer = jax.random.choice(
            r_layer, cfg.num_quantizers, p=jnp.asarray(_layer_weights(cfg))
        )
        mprob = mask_prob_schedule(t)

        # CFG prompt dropout: with prob cfg_dropout keep NO prompt
        use_prompt = jax.random.uniform(r_drop, ()) > cfg.cfg_dropout
        plen = jax.random.randint(
            r_plen, (b,), jnp.minimum(tlen // 4, 5), jnp.maximum(tlen // 2, 6)
        )
        plen = jnp.where(use_prompt, plen, 0)
        is_prompt = jnp.arange(tlen)[None, :] < plen[:, None]  # [B,T]

        mask = jax.random.bernoulli(r_mask, mprob[:, None], (b, tlen))
        mask = jnp.where(is_prompt, False, mask)
        # ensure at least one masked position per row
        none_masked = jnp.sum(mask, axis=1) == 0
        force = jnp.arange(tlen)[None, :] == plen[:, None]
        mask = jnp.where(none_masked[:, None] & force, True, mask)

        # assemble xt: layers < mask_layer revealed; == mask_layer partially
        # masked; > mask_layer all mask tokens (prompt positions revealed)
        layer_ids = jnp.arange(q)
        below = (layer_ids < mask_layer)[None, None, :]  # [1,1,Q]
        at = (layer_ids == mask_layer)[None, None, :]
        token_embs = jnp.stack(
            [jnp.take(self.token_emb[l], x0[..., l], axis=0) for l in range(q)], axis=2
        )  # [B,T,Q,H]
        m = mask[:, :, None]
        reveal_at = jnp.where(m, 0.0, 1.0)[..., None]  # [B,T,1,1]
        prompt_reveal = is_prompt[:, :, None, None].astype(jnp.float32)
        w_below = below[..., None].astype(jnp.float32)
        w_at = at[..., None].astype(jnp.float32) * jnp.where(
            m[..., None], 0.0, 1.0
        )
        w_above = (layer_ids > mask_layer)[None, None, :, None].astype(jnp.float32) * prompt_reveal
        contrib = token_embs * (w_below + w_at + w_above)
        xt = jnp.sum(contrib, axis=2)
        n_masked_embs = (
            at[..., 0].astype(jnp.float32) * mask[:, :, None].astype(jnp.float32)
        ).sum(-1) + (
            (layer_ids > mask_layer)[None, None, :].astype(jnp.float32)
            * (1.0 - prompt_reveal[..., 0])
        ).sum(-1)
        xt = xt + n_masked_embs[..., None] * self.mask_emb

        cond = jnp.take(self.cond_emb, cond_code, axis=0)
        cond = cond + self.layer_emb[mask_layer][None, None, :]

        embeds = self.denoiser(xt.astype(cfg.dtype), t, cond.astype(cfg.dtype), x_mask)
        logits = (
            embeds.astype(jnp.float32) @ self.to_logits_w[mask_layer]
            + self.to_logits_b[mask_layer]
        )

        final_mask = mask & (x_mask > 0)
        targets = jnp.take_along_axis(
            x0, jnp.full((b, tlen, 1), mask_layer, jnp.int32), axis=-1
        )[..., 0]
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        denom = jnp.maximum(jnp.sum(final_mask), 1.0)
        loss = jnp.sum(jnp.where(final_mask, nll, 0.0)) / denom
        return loss, {"mask_layer": mask_layer, "masked_tokens": denom}

    # ------------------------------------------------------------- sampling
    def _sample_step(
        self, layer, seq, mask, cum, cond_full, prompt_sum, full_mask, x_mask,
        t_now, t_next, next_mask_num, is_last, key,
        p, tlen, temperature, topk_keep, cfg_scale, rescale_cfg, steps_is_one,
        all_valid=True,
    ):
        """One confidence-unmasking step. ``layer`` may be a traced index; all
        per-step scalars (t_now, next_mask_num, is_last) may be traced — the
        body compiles ONCE per step-count group. ``next_mask_num`` may be a
        scalar or per-row [B] (variable-length batching); ``all_valid=False``
        makes the denoiser honor the pad masks."""
        c = self.cfg
        b = seq.shape[0]
        emb_l = jnp.take(self.token_emb, layer, axis=0)  # [K, H]
        w_l = jnp.take(self.to_logits_w, layer, axis=0)
        b_l = jnp.take(self.to_logits_b, layer, axis=0)
        layer_cond = cond_full + jnp.take(self.layer_emb, layer, axis=0)[None, None, :]

        t_vec = jnp.full((b,), t_now, jnp.float32)
        token = jnp.take(emb_l, seq, axis=0)
        cur = cum + jnp.where(mask[..., None], self.mask_emb, token)
        cur = cur + self.mask_emb * (c.num_quantizers - 1 - layer).astype(jnp.float32)

        xt_input = cur if p == 0 else jnp.concatenate([prompt_sum, cur], axis=1)
        embeds = self.denoiser(
            xt_input.astype(c.dtype), t_vec, layer_cond.astype(c.dtype), full_mask,
            all_valid=all_valid,
        )[:, p:]
        if cfg_scale > 0 and p > 0:
            uncond = self.denoiser(
                cur.astype(c.dtype), t_vec, layer_cond[:, p:].astype(c.dtype), x_mask,
                all_valid=all_valid,
            )
            if all_valid:
                _std = jnp.std
            else:
                # exclude padded positions from the CFG rescale statistics
                w = x_mask[..., None].astype(jnp.float32)
                denom = jnp.maximum(jnp.sum(w) * embeds.shape[-1], 1.0)

                def _std(x):
                    mu = jnp.sum(x * w) / denom
                    return jnp.sqrt(jnp.sum(jnp.square((x - mu) * w)) / denom)

            std_pos = _std(embeds)
            guided = embeds + cfg_scale * (embeds - uncond)
            rescaled = guided * std_pos / jnp.maximum(_std(guided), 1e-6)
            embeds = rescale_cfg * rescaled + (1 - rescale_cfg) * guided

        logits = embeds.astype(jnp.float32) @ w_l + b_l
        kth = _kth_largest(logits, topk_keep)
        logits = jnp.where(logits < kth, -1e9, logits)

        anneal = t_now
        if steps_is_one:
            temp = jnp.asarray(0.2, jnp.float32)
        else:
            temp = jnp.maximum(temperature * anneal, 1e-3)
        k_samp = jax.random.fold_in(key, 0)
        k_choice = jax.random.fold_in(key, 1)
        g = -jnp.log(-jnp.log(
            jax.random.uniform(k_samp, logits.shape, minval=1e-9, maxval=1.0)
        ))
        gumbel_sampled = jnp.argmax(logits / temp + g, axis=-1).astype(jnp.int32)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if steps_is_one:
            sampled = gumbel_sampled
        else:
            sampled = jnp.where(is_last, greedy, gumbel_sampled)
        seq = jnp.where(mask, sampled, seq)

        # confidence re-masking (skipped on the final step)
        probs = jax.nn.softmax(logits, axis=-1)
        conf = jnp.take_along_axis(probs, sampled[..., None], axis=-1)[..., 0]
        gn = -jnp.log(-jnp.log(
            jax.random.uniform(k_choice, conf.shape, minval=1e-9, maxval=1.0)
        ))
        scores = (1.0 - conf) + anneal * gn
        scores = jnp.where(mask, scores, -jnp.inf)
        # rank-threshold re-mask: full sort so next_mask_num may be traced
        _, order = jax.lax.top_k(scores, tlen)
        ranks = jnp.zeros((b, tlen), jnp.int32).at[
            jnp.arange(b)[:, None], order
        ].set(jnp.broadcast_to(jnp.arange(tlen)[None, :], (b, tlen)))
        nmn = jnp.asarray(next_mask_num)
        if nmn.ndim == 1:  # per-row counts (variable-length batching)
            nmn = nmn[:, None]
        new_mask = ranks < nmn
        keep_going = jnp.logical_not(is_last) & (nmn > 0)
        mask = jnp.where(keep_going, new_mask, jnp.zeros_like(new_mask))
        seq = jnp.where(mask, 0, seq)
        return seq, mask

    def reverse_diffusion(
        self,
        cond_code,  # [B, P+T] semantic tokens (prompt-aligned + target)
        prompt_code,  # [B, P, Q] acoustic codes of the prompt
        rng,
        n_timesteps=(10, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4, 4),
        temperature: float = 1.5,
        filter_thres: float = 0.98,
        cfg: float = 1.0,
        rescale_cfg: float = 1.0,
        cfg_until: float = 1.0,
        unroll: bool = False,
        x_mask=None,
        prompt_mask=None,
    ):
        """Iterative per-layer confidence unmasking. Returns [B, T, Q].

        Reference: maskgct_s2a.py reverse_diffusion:318. By default, layers
        with equal step counts run under nested lax.scan with a *traced*
        layer index, so the denoiser traces once per step-count group (2
        traces for the default (10, 4x11) schedule instead of 58) — compile
        time drops by an order of magnitude while keeping one fused XLA
        program. ``unroll=True`` traces every step (same math, same rng keys;
        used for parity testing).

        Variable-length batching (beyond the reference's python sampler):
        pass ``x_mask`` [B, T] / ``prompt_mask`` [B, P] to batch requests of
        different lengths padded to common T/P — padded positions are
        excluded from attention, sampling, and the per-row re-masking counts
        (``next_mask_num`` becomes ceil-free ``floor(schedule * row_len)``).
        With both masks None the math (and rng stream) is bit-identical to
        the fixed-length path.

        ``cfg_until`` (beyond the reference sampler): apply classifier-free
        guidance only on the first ``ceil(cfg_until * steps)`` unmasking
        steps of each layer; later steps skip the unconditional denoiser
        call entirely (a static split — two scans — so the late-step program
        contains no uncond branch). Guidance steers WHICH tokens are
        committed, and most positions commit early under the sin schedule;
        the late steps refine the low-confidence tail where the conditional
        distribution already dominates. ``cfg_until=1.0`` is bit-identical
        to the reference behavior. Quality must be certified per-config via
        benchmarks/recipes/s2a_schedule_gate.py before serving with <1.0.
        """
        c = self.cfg
        b, p, q = prompt_code.shape
        total = cond_code.shape[1]
        tlen = total - p
        assert len(n_timesteps) == c.num_quantizers

        variable = x_mask is not None or prompt_mask is not None
        if x_mask is None:
            x_mask = jnp.ones((b, tlen), jnp.int32)
        x_mask = x_mask.astype(jnp.int32)
        if prompt_mask is None:
            prompt_mask = jnp.ones((b, p), jnp.int32)
        prompt_mask = prompt_mask.astype(jnp.int32)
        tlen_rows = jnp.sum(x_mask, axis=1).astype(jnp.float32)  # [B]

        cond_full = jnp.take(self.cond_emb, cond_code, axis=0)  # [B,P+T,H]
        prompt_sum = self.embed_tokens_upto_stacked(prompt_code)  # [B,P,H]
        full_mask = (jnp.concatenate([prompt_mask, x_mask], axis=1)
                     if p > 0 else x_mask)
        topk_keep = max(1, int((1.0 - filter_thres) * c.codebook_size))

        def step_args(steps):
            t_list = [1.0 - i / steps for i in range(steps)] + [0.0]
            return dict(
                t_now=np.asarray(t_list[:-1], np.float32),
                # fixed-length path: exact reference ints; variable path:
                # the per-row count is floor(sin_next * row_len) in-body
                next_mask_num=np.asarray(
                    [int(float(np.sin(t * np.pi / 2)) * tlen) for t in t_list[1:]],
                    np.int32,
                ),
                sin_next=np.asarray(
                    [float(np.sin(t * np.pi / 2)) for t in t_list[1:]], np.float32
                ),
                is_last=np.asarray(
                    [i == steps - 1 for i in range(steps)], bool
                ),
            )

        common = dict(
            cond_full=cond_full, prompt_sum=prompt_sum, full_mask=full_mask,
            x_mask=x_mask, p=p, tlen=tlen, temperature=temperature,
            topk_keep=topk_keep, rescale_cfg=rescale_cfg,
            all_valid=not variable,
        )

        def run_layer(layer, cum, steps, sargs, steps_is_one):
            seq = jnp.zeros((b, tlen), jnp.int32)
            mask = x_mask.astype(bool)
            # static CFG cutoff: uncond calls only on the first cfg_steps
            cfg_steps = steps if cfg <= 0 else min(
                steps, int(np.ceil(cfg_until * steps))
            )

            def make_body(scale):
                def body(carry, xs):
                    seq, mask = carry
                    i, t_now, nmn, sin_next, last = xs
                    if variable:
                        nmn = jnp.floor(sin_next * tlen_rows).astype(jnp.int32)
                    key = jax.random.fold_in(
                        jax.random.fold_in(rng, layer * 1000), i
                    )
                    seq, mask = self._sample_step(
                        layer, seq, mask, cum, t_now=t_now, t_next=0.0,
                        next_mask_num=nmn, is_last=last, key=key,
                        steps_is_one=steps_is_one, cfg_scale=scale, **common,
                    )
                    return (seq, mask), None
                return body

            xs = (
                jnp.arange(steps), jnp.asarray(sargs["t_now"]),
                jnp.asarray(sargs["next_mask_num"]),
                jnp.asarray(sargs["sin_next"]), jnp.asarray(sargs["is_last"]),
            )
            if unroll:
                carry = (seq, mask)
                for i in range(steps):
                    carry, _ = make_body(cfg if i < cfg_steps else 0.0)(
                        carry, jax.tree.map(lambda a: a[i], xs)
                    )
                seq, mask = carry
            elif cfg_steps >= steps:
                (seq, mask), _ = jax.lax.scan(make_body(cfg), (seq, mask), xs)
            else:
                head = jax.tree.map(lambda a: a[:cfg_steps], xs)
                tail = jax.tree.map(lambda a: a[cfg_steps:], xs)
                (seq, mask), _ = jax.lax.scan(make_body(cfg), (seq, mask), head)
                (seq, mask), _ = jax.lax.scan(make_body(0.0), (seq, mask), tail)
            return seq

        # group consecutive layers by step count
        groups: list[tuple[int, list[int]]] = []
        for l, st in enumerate(n_timesteps):
            if groups and groups[-1][0] == st:
                groups[-1][1].append(l)
            else:
                groups.append((st, [l]))

        cum = jnp.zeros((b, tlen, c.hidden_size), jnp.float32)
        codes = jnp.zeros((b, tlen, c.num_quantizers), jnp.int32)

        for steps, layers in groups:
            sargs = step_args(steps)
            steps_is_one = steps == 1
            if unroll or len(layers) == 1:
                for l in layers:
                    seq = run_layer(jnp.asarray(l), cum, steps, sargs, steps_is_one)
                    cum = cum + jnp.take(
                        jnp.take(self.token_emb, l, axis=0), seq, axis=0
                    )
                    codes = codes.at[:, :, l].set(seq)
            else:
                def layer_body(carry, layer):
                    cum, codes = carry
                    seq = run_layer(layer, cum, steps, sargs, steps_is_one)
                    cum = cum + jnp.take(
                        jnp.take(self.token_emb, layer, axis=0), seq, axis=0
                    )
                    codes = jax.lax.dynamic_update_slice_in_dim(
                        codes, seq[..., None], layer, axis=2
                    )
                    return (cum, codes), None

                (cum, codes), _ = jax.lax.scan(
                    layer_body, (cum, codes), jnp.asarray(layers, jnp.int32)
                )

        return codes

    def embed_tokens_upto_stacked(self, codes):
        """codes [B,P,Q] -> summed embeddings [B,P,H]."""
        out = 0.0
        for l in range(self.cfg.num_quantizers):
            out = out + jnp.take(self.token_emb[l], codes[..., l], axis=0)
        return out

    def __call__(self, x0, x_mask, cond_code, rng):
        return self.compute_loss(x0, x_mask, cond_code, rng)
