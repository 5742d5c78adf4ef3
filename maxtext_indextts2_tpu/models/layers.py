"""Core NN building blocks: Embed, RMSNorm, DenseGeneral, MlpBlock.

TPU-native equivalents of reference layers
(MaxText/layers/embeddings.py:89 Embed, normalizations.py:30 RMSNorm,
linears.py:96 DenseGeneral, linears.py:297 MlpBlock). All weights carry
logical axis names; all matmuls run in bf16 activations against the MXU with
float32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name
import numpy as np

from maxtext_indextts2_tpu.parallel.sharding import shard

Initializer = Callable[..., jax.Array]


def _canon_tuple(x) -> tuple[int, ...]:
    if isinstance(x, Iterable) and not isinstance(x, (str, bytes)):
        return tuple(int(v) for v in x)
    return (int(x),)


def nd_dense_init(scale: float = 1.0, mode: str = "fan_in", distribution: str = "truncated_normal"):
    """Variance-scaling init parameterized over (in_axes, out_axes)."""

    def init(key, shape, dtype, in_axis, out_axis):
        fn = jax.nn.initializers.variance_scaling(
            scale, mode, distribution, in_axis, out_axis
        )
        return fn(key, shape, dtype)

    return init


class DenseGeneral(nn.Module):
    """Einsum-style linear over arbitrary contraction axes.

    features: output feature dims; axis: input dims to contract.
    kernel_axes: logical axis names for the kernel (in dims then out dims).
    """

    features: int | Sequence[int]
    axis: int | Sequence[int] = -1
    kernel_axes: Sequence[str | None] = ()
    dtype: jnp.dtype = jnp.bfloat16
    weight_dtype: jnp.dtype = jnp.float32
    kernel_init: Initializer = nd_dense_init()
    use_bias: bool = False
    matmul_precision: str = "default"
    quantization: str = ""  # "" | int8 | int8w | fp8 (AQT)
    lora_rank: int = 0  # LoRA adapter rank (0 = off); B zero-init
    lora_alpha: float = 16.0

    @nn.compact
    def __call__(self, inputs: jax.Array) -> jax.Array:
        features = _canon_tuple(self.features)
        axis = _canon_tuple(self.axis)
        axis = tuple(ax % inputs.ndim for ax in axis)

        kernel_shape = tuple(inputs.shape[ax] for ax in axis) + features
        in_axes = tuple(range(len(axis)))
        out_axes = tuple(range(len(axis), len(axis) + len(features)))

        if self.quantization == "int8w_serve":
            return self._serve_quantized(inputs, kernel_shape, axis, features, in_axes)

        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                lambda key, shape, dtype: self.kernel_init(key, shape, dtype, in_axes, out_axes),
                tuple(self.kernel_axes),
            ),
            kernel_shape,
            self.weight_dtype,
        )

        inputs = inputs.astype(self.dtype)
        kernel = kernel.astype(self.dtype)
        contract = ((axis, in_axes), ((), ()))
        if self.quantization:
            from maxtext_indextts2_tpu.ops.quantization import make_dot_general

            dg = make_dot_general(self.quantization)(name="aqt")
            out = dg(inputs, kernel, contract, precision=None).astype(self.dtype)
        else:
            out = jax.lax.dot_general(
                inputs,
                kernel,
                contract,
                precision=_precision(self.matmul_precision),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        if self.lora_rank > 0:
            # additive low-rank adapter: x @ A @ B * alpha/r (B zero-init so
            # the adapted model starts identical to the base model)
            r = self.lora_rank
            flat_in = int(np.prod([inputs.shape[ax] for ax in axis]))
            flat_out = int(np.prod(features))
            lora_a = self.param(
                "lora_a",
                nn.with_logical_partitioning(
                    nn.initializers.normal(1.0 / r), (None, None)
                ),
                (flat_in, r),
                self.weight_dtype,
            )
            lora_b = self.param(
                "lora_b",
                nn.with_logical_partitioning(jax.nn.initializers.zeros, (None, None)),
                (r, flat_out),
                self.weight_dtype,
            )
            batch_shape = tuple(
                d for i, d in enumerate(inputs.shape) if i not in axis
            )
            x2 = inputs.reshape(batch_shape + (flat_in,))
            delta = (x2 @ lora_a.astype(self.dtype)) @ lora_b.astype(self.dtype)
            out = out + (self.lora_alpha / r) * delta.reshape(out.shape)

        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    jax.nn.initializers.zeros, tuple(self.kernel_axes[len(axis):])
                ),
                features,
                self.weight_dtype,
            )
            out = out + bias.astype(self.dtype)
        return out

    def _serve_quantized(self, inputs, kernel_shape, axis, features, in_axes):
        """Offline weight-only int8 serving path (reference quantize_params:
        MaxText/maxengine.py:318 via AQT convert/serve). The kernel is stored
        int8 with per-output-channel f32 scales — Engine.load_params fills
        them from a float checkpoint via quantize_params_for_serving. Decode
        is HBM-bound, so halving the bytes read per weight roughly halves
        weight-streaming time; XLA fuses the dequant into the matmul read.
        Serving only: int8 params take no gradient."""
        scale_shape = (1,) * len(axis) + features
        kernel = self.param(
            "kernel",
            nn.with_logical_partitioning(
                lambda key, shape, dtype: jnp.zeros(shape, dtype),
                tuple(self.kernel_axes),
            ),
            kernel_shape,
            jnp.int8,
        )
        scale = self.param(
            "kernel_scale",
            nn.with_logical_partitioning(
                lambda key, shape, dtype: jnp.ones(shape, dtype),
                (None,) * len(scale_shape),
            ),
            scale_shape,
            jnp.float32,
        )
        inputs = inputs.astype(self.dtype)
        kernel_f = kernel.astype(self.dtype) * scale.astype(self.dtype)
        contract = ((axis, in_axes), ((), ()))
        out = jax.lax.dot_general(
            inputs, kernel_f, contract,
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    jax.nn.initializers.zeros,
                    tuple(self.kernel_axes[len(axis):]),
                ),
                features,
                self.weight_dtype,
            )
            out = out + bias.astype(self.dtype)
        return out


def _precision(name: str):
    if name == "default":
        return None
    return jax.lax.Precision(name.upper())


class RMSNorm(nn.Module):
    """RMS layer norm (reference: MaxText/layers/normalizations.py:30).

    With use_mean + use_bias this is a full LayerNorm (mean-centered,
    affine) — the gpt3 family's norm (reference: MaxText/layers/gpt3.py:53
    Gpt3LayerNorm, reductions in fp32)."""

    epsilon: float = 1e-6
    dtype: jnp.dtype = jnp.bfloat16
    weight_dtype: jnp.dtype = jnp.float32
    kernel_axes: Sequence[str | None] = ("norm",)
    scale_plus_one: bool = False  # gemma-style (scale initialized around 1)
    use_mean: bool = False  # subtract mean (LayerNorm) instead of pure RMS
    use_bias: bool = False  # learned additive bias after scaling

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dtype_in = x.dtype
        x32 = jnp.asarray(x, jnp.float32)
        if self.use_mean:
            x32 = x32 - jnp.mean(x32, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x32), axis=-1, keepdims=True)
        normed = x32 * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param(
            "scale",
            nn.with_logical_partitioning(
                jax.nn.initializers.zeros if self.scale_plus_one else jax.nn.initializers.ones,
                tuple(self.kernel_axes),
            ),
            (x.shape[-1],),
            self.weight_dtype,
        )
        scale = jnp.asarray(scale, jnp.float32)
        if self.scale_plus_one:
            scale = scale + 1.0
        out = normed * scale
        if self.use_bias:
            bias = self.param(
                "bias",
                nn.with_logical_partitioning(
                    jax.nn.initializers.zeros, tuple(self.kernel_axes)
                ),
                (x.shape[-1],),
                self.weight_dtype,
            )
            out = out + jnp.asarray(bias, jnp.float32)
        return jnp.asarray(out, dtype_in)


class Embed(nn.Module):
    """Token embedding with optional logit tying.

    Reference: MaxText/layers/embeddings.py:89; ``attend`` mirrors
    attend_on_embedding (:183) for logits_via_embedding.
    """

    num_embeddings: int
    features: int
    dtype: jnp.dtype = jnp.bfloat16
    weight_dtype: jnp.dtype = jnp.float32
    use_iota_one_hot: bool = False  # one-hot matmul lookup (old-TPU path); gather is fine on v4+

    def setup(self):
        self.embedding = self.param(
            "embedding",
            nn.with_logical_partitioning(
                jax.nn.initializers.variance_scaling(1.0, "fan_in", "normal", out_axis=0),
                ("vocab", "embed"),
            ),
            (self.num_embeddings, self.features),
            self.weight_dtype,
        )

    def __call__(self, ids: jax.Array) -> jax.Array:
        table = self.embedding.astype(self.dtype)
        if self.use_iota_one_hot:
            one_hot = jax.nn.one_hot(ids, self.num_embeddings, dtype=self.dtype)
            out = jnp.dot(one_hot, table, preferred_element_type=jnp.float32).astype(self.dtype)
        else:
            out = jnp.take(table, ids, axis=0)
        return shard(out, "activation_embed_and_logits_batch", "activation_length", "activation_embed")

    def attend(self, query: jax.Array, normalize: bool = True) -> jax.Array:
        """Project hidden states onto the embedding table (tied logits)."""
        table = self.embedding.astype(self.dtype)
        logits = jnp.dot(
            query.astype(self.dtype), table.T, preferred_element_type=jnp.float32
        )
        if normalize:
            # reference: embeddings.py attend scales by 1/sqrt(d) for stability
            logits = logits / np.sqrt(self.features)
        return logits


ACTIVATIONS: dict[str, Callable[[jax.Array], jax.Array]] = {
    "silu": jax.nn.silu,
    "swish": jax.nn.silu,
    "gelu": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_exact": lambda x: jax.nn.gelu(x, approximate=False),
    "relu": jax.nn.relu,
    "tanh": jnp.tanh,
    "linear": lambda x: x,
    "sigmoid": jax.nn.sigmoid,
}


class MlpBlock(nn.Module):
    """Gated MLP: fused [wi_0; wi_1] projection, activation product, wo.

    Reference: MaxText/layers/linears.py:297. For ("silu","linear") this is
    the llama SwiGLU block.
    """

    intermediate_dim: int
    activations: Sequence[str] = ("silu", "linear")
    dtype: jnp.dtype = jnp.bfloat16
    weight_dtype: jnp.dtype = jnp.float32
    intermediate_dropout_rate: float = 0.0
    matmul_precision: str = "default"
    use_bias: bool = False
    quantization: str = ""

    @nn.compact
    def __call__(self, inputs: jax.Array, deterministic: bool = True) -> jax.Array:
        acts = []
        for i, act_name in enumerate(self.activations):
            x = DenseGeneral(
                features=self.intermediate_dim,
                kernel_axes=("embed", "mlp"),
                dtype=self.dtype,
                weight_dtype=self.weight_dtype,
                matmul_precision=self.matmul_precision,
                use_bias=self.use_bias,
                quantization=self.quantization,
                name=f"wi_{i}" if len(self.activations) > 1 else "wi",
            )(inputs)
            acts.append(ACTIVATIONS[act_name](x))
        x = acts[0]
        for a in acts[1:]:
            x = x * a
        x = shard(x, "activation_batch", "activation_length", "activation_mlp")
        # remat anchor (see models/decoder.py _remat_policy): 256 MB/layer at
        # 1B/batch-8 — only worth saving when HBM allows (save_attn_and_mlp)
        x = checkpoint_name(x, "mlp_pre_wo")
        if self.intermediate_dropout_rate > 0.0 and not deterministic:
            x = nn.Dropout(rate=self.intermediate_dropout_rate)(x, deterministic=False)
        out = DenseGeneral(
            features=inputs.shape[-1],
            kernel_axes=("mlp", "embed"),
            dtype=self.dtype,
            weight_dtype=self.weight_dtype,
            matmul_precision=self.matmul_precision,
            use_bias=self.use_bias,
            quantization=self.quantization,
            name="wo",
        )(x)
        return out
