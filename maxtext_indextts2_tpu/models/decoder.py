"""Decoder: configurable transformer block + scan-over-layers stack.

Replaces the reference's per-family layer modules + Decoder
(MaxText/layers/decoders.py:62 DecoderLayer, :242 Decoder, plus
llama2.py/gemma*.py/qwen3.py/mistral.py/...) with ONE config-driven block.
Family differences (sandwich norms, softcaps, qk-norm, sliding/global
patterns, MoE placement) are data, not code — see models/registry.py.

Heterogeneous per-layer attention (e.g. gemma2's local/global alternation)
is handled by making the scan unit a *group* of sub-layers
(``attention_pattern``), so ``lax.scan`` still sees identical pytrees.
"""

from __future__ import annotations

import functools
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.models.attention import MODE_TRAIN, Attention
from maxtext_indextts2_tpu.models.layers import MlpBlock, RMSNorm
from maxtext_indextts2_tpu.parallel.sharding import shard


def _attention_kwargs(cfg: Config, block, mesh, attention_type: str) -> dict[str, Any]:
    sliding = cfg.sliding_window_size if attention_type == "local_sliding" else 0
    chunk = cfg.chunk_attn_window_size if attention_type == "chunk" else 0
    nope = attention_type == "global_nope"
    return dict(
        num_query_heads=cfg.num_query_heads,
        num_kv_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_target_length=cfg.max_target_length,
        attention_kernel=cfg.attention,
        dtype=jnp.dtype(cfg.dtype),
        weight_dtype=jnp.dtype(cfg.weight_dtype),
        float32_qk_product=cfg.float32_qk_product,
        attn_logits_soft_cap=cfg.attn_logits_soft_cap,
        sliding_window_size=sliding,
        chunk_attn_window_size=chunk,
        rope_type="none" if nope else cfg.rope_type,
        rope_interleave=block.rope_interleave,
        rope_max_timescale=cfg.rope_max_timescale,
        rope_factor=cfg.rope_factor,
        rope_low_freq_factor=cfg.rope_low_freq_factor,
        rope_high_freq_factor=cfg.rope_high_freq_factor,
        rope_original_max_position=cfg.rope_original_max_position,
        use_qk_norm=block.use_qk_norm and not nope,
        qk_norm_scale_plus_one=block.rmsnorm_scale_plus_one,
        qk_norm_type=block.qk_norm_type,
        use_temperature_tuning=nope and block.attn_temperature_tuning,
        attn_temperature_scale=cfg.attn_temperature_scale,
        attn_temperature_floor_scale=cfg.attn_temperature_floor_scale,
        decode_attention=cfg.decode_attention,
        query_pre_attn_scalar=(
            cfg.query_pre_attn_scalar if cfg.query_pre_attn_scalar > 0
            else block.query_pre_attn_scalar
        ),
        normalization_layer_epsilon=cfg.normalization_layer_epsilon,
        use_bias=block.use_attn_bias,
        matmul_precision=cfg.matmul_precision,
        quantization=cfg.quantization,
        quantize_kvcache=cfg.quantize_kvcache,
        lora_rank=cfg.lora_rank,
        flash_block_sizes=tuple(cfg.flash_block_sizes),
        paged_attention=cfg.paged_attention,
        pagedattn_num_pages=cfg.pagedattn_num_pages,
        pagedattn_tokens_per_page=cfg.pagedattn_tokens_per_page,
        context_parallelism=cfg.ici_context_parallelism,
        load_balanced_context_parallel=cfg.context_parallel_load_balance,
        context_parallel_algorithm=cfg.context_parallel_algorithm,
        mesh=mesh,
    )


class DecoderLayer(nn.Module):
    """One scan unit: ``len(block.attention_pattern)`` transformer sub-layers."""

    cfg: Config
    block: Any  # registry.BlockStyle
    mesh: Any = None
    use_moe: bool = False

    @nn.compact
    def __call__(
        self,
        inputs: jax.Array,
        positions: jax.Array,
        segment_ids: jax.Array | None,
        mode: str = MODE_TRAIN,
        deterministic: bool = True,
        cache_offset=None,
        page_state=None,
    ):
        x = inputs
        for i, attention_type in enumerate(self.block.attention_pattern):
            x = self._sublayer(x, positions, segment_ids, mode, deterministic, i,
                               attention_type, cache_offset, page_state)
        # (carry, ys) contract so the module is directly nn.scan-able
        return x, None

    def _sublayer(self, x, positions, segment_ids, mode, deterministic, idx,
                  attention_type, cache_offset=None, page_state=None):
        cfg, block = self.cfg, self.block
        dtype = jnp.dtype(cfg.dtype)
        norm = functools.partial(
            RMSNorm,
            epsilon=cfg.normalization_layer_epsilon,
            dtype=dtype,
            weight_dtype=jnp.dtype(cfg.weight_dtype),
            scale_plus_one=block.rmsnorm_scale_plus_one,
            use_mean=block.use_layer_norm,
            use_bias=block.use_layer_norm,
        )
        x = shard(x, "activation_batch", "activation_norm_length", "activation_embed")

        # ---- attention sublayer
        h = norm(name=f"pre_self_attention_norm_{idx}")(x) if block.use_pre_norm else x
        if block.use_mla:
            from maxtext_indextts2_tpu.models.mla import MLAttention

            attn_out = MLAttention(cfg=cfg, mesh=self.mesh, name=f"self_attention_{idx}")(
                h, positions, segment_ids, mode=mode, deterministic=deterministic
            )
        else:
            attn_out = Attention(
                **_attention_kwargs(cfg, block, self.mesh, attention_type),
                name=f"self_attention_{idx}",
            )(h, h, positions, segment_ids, mode=mode, deterministic=deterministic,
              cache_offset=cache_offset, page_state=page_state)
        if block.use_post_attn_norm:
            attn_out = norm(name=f"post_self_attention_norm_{idx}")(attn_out)
        x = x + attn_out

        # ---- mlp / moe sublayer
        h = norm(name=f"pre_mlp_norm_{idx}")(x) if block.use_pre_norm else x
        moe_subs = tuple(cfg.moe_sublayer_pattern) or block.moe_sublayers
        is_moe = self.use_moe and (moe_subs is None or idx in moe_subs)
        if is_moe:
            from maxtext_indextts2_tpu.models.moe import RoutedMoE

            mlp_out, lb_loss = RoutedMoE(cfg=cfg, mesh=self.mesh, name=f"moe_{idx}")(
                h, deterministic=deterministic
            )
            if lb_loss is not None:
                self.sow("intermediates", "moe_lb_loss", lb_loss)
        else:
            mlp_out = MlpBlock(
                intermediate_dim=cfg.mlp_dim,
                activations=cfg.mlp_activations,
                dtype=dtype,
                weight_dtype=jnp.dtype(cfg.weight_dtype),
                intermediate_dropout_rate=cfg.dropout_rate,
                matmul_precision=cfg.matmul_precision,
                use_bias=block.use_mlp_bias,
                quantization=cfg.quantization,
                name=f"mlp_{idx}",
            )(h, deterministic=deterministic)
        if block.use_post_ffw_norm:
            mlp_out = norm(name=f"post_ffw_norm_{idx}")(mlp_out)
        x = x + mlp_out
        return shard(x, "activation_batch", "activation_norm_length", "activation_embed")


def _remat_policy(name: str):
    if name == "none" or name is None:
        return None
    policies = {
        "full": None,  # nn.remat default: save nothing
        "minimal": jax.checkpoint_policies.checkpoint_dots_with_no_batch_dims,
        # anchors: "attn_out" (models/attention.py, 64 MB/layer @1B b8) —
        # backward skips recomputing qkv proj + the flash fwd kernel;
        # "mlp_pre_wo" (models/layers.py, 256 MB/layer) — also skips the
        # wi_0/wi_1 matmuls, the big recompute, when HBM allows
        "save_attn_out": jax.checkpoint_policies.save_only_these_names(
            "attn_out"
        ),
        "save_attn_and_mlp": jax.checkpoint_policies.save_only_these_names(
            "attn_out", "mlp_pre_wo"
        ),
    }
    # legacy names from earlier configs map onto the nearest current policy
    policies["save_dot_except_mlp"] = policies["save_attn_out"]
    policies["save_qkv_proj"] = policies["save_attn_out"]
    if name not in policies:
        raise ValueError(
            f"unknown remat_policy {name!r}; choose from "
            f"{['none', *policies]} (an unknown name must not silently "
            "become 'save nothing')"
        )
    return policies[name]


class Decoder(nn.Module):
    """Stack of DecoderLayers with optional lax.scan + remat.

    Handles deepseek-style leading dense layers before the MoE region by
    running two homogeneous scans (reference: MaxText/layers/deepseek.py).
    """

    cfg: Config
    block: Any
    mesh: Any = None

    @nn.compact
    def __call__(
        self,
        y: jax.Array,
        positions: jax.Array,
        segment_ids: jax.Array | None,
        mode: str = MODE_TRAIN,
        deterministic: bool = True,
        cache_offset=None,
        page_state=None,
    ) -> jax.Array:
        cfg, block = self.cfg, self.block
        group = len(block.attention_pattern)
        moe_enabled = cfg.num_experts > 1

        regions: list[tuple[str, int, bool]] = []  # (name, num_units, use_moe)
        if moe_enabled and cfg.first_num_dense_layers > 0:
            regions.append(("dense_layers", cfg.first_num_dense_layers // group, False))
            regions.append(
                ("moe_layers", (cfg.num_decoder_layers - cfg.first_num_dense_layers) // group, True)
            )
        else:
            regions.append(("layers", cfg.num_decoder_layers // group, moe_enabled))

        for name, num_units, use_moe in regions:
            if num_units == 0:
                continue
            y = self._run_region(
                name, num_units, use_moe, y, positions, segment_ids, mode,
                deterministic, cache_offset, page_state
            )
        return y

    def _run_region(self, name, num_units, use_moe, y, positions, segment_ids, mode,
                    deterministic, cache_offset=None, page_state=None):
        cfg = self.cfg
        layer_kwargs = dict(cfg=cfg, block=self.block, mesh=self.mesh, use_moe=use_moe)

        if cfg.using_pipeline_parallelism and mode == MODE_TRAIN:
            from maxtext_indextts2_tpu.models.pipeline import Pipeline

            stages = cfg.ici_stage_parallelism * cfg.dcn_stage_parallelism
            if num_units != stages * cfg.num_pipeline_repeats:
                raise ValueError(
                    f"pipeline needs num_units ({num_units}) == stages ({stages})"
                    f" * repeats ({cfg.num_pipeline_repeats})"
                )
            return Pipeline(**layer_kwargs, name=name)(
                y, positions, segment_ids, mode, deterministic
            )

        if cfg.scan_layers:
            if mode == MODE_TRAIN and cfg.remat_policy != "none":
                layer_cls = nn.remat(
                    DecoderLayer,
                    prevent_cse=False,
                    policy=_remat_policy(cfg.remat_policy),
                    static_argnums=(4, 5),
                )
            else:
                layer_cls = DecoderLayer
            scan_fn = nn.scan(
                layer_cls,
                variable_axes={"params": 0, "cache": 0, "intermediates": 0},
                split_rngs={"params": True, "dropout": True},
                in_axes=(nn.broadcast,) * 6,
                length=num_units,
                metadata_params={nn.PARTITION_NAME: "layers"},
            )
            y, _ = scan_fn(**layer_kwargs, name=name)(
                y, positions, segment_ids, mode, deterministic, cache_offset,
                page_state
            )
        else:
            # unrolled layers need remat too — without it every layer's
            # activations stay live through the backward pass (measured:
            # identical 8.4 GB temp for remat minimal vs full at 1.28B
            # because neither applied here). prevent_cse must be TRUE here:
            # outside a scan body XLA CSEs the rematerialized forward with
            # the original, keeping every saved buffer alive anyway.
            if mode == MODE_TRAIN and cfg.remat_policy != "none":
                layer_cls = nn.remat(
                    DecoderLayer,
                    prevent_cse=True,
                    policy=_remat_policy(cfg.remat_policy),
                    static_argnums=(4, 5),
                )
            else:
                layer_cls = DecoderLayer
            for i in range(num_units):
                y, _ = layer_cls(**layer_kwargs, name=f"{name}_{i}")(
                    y, positions, segment_ids, mode, deterministic, cache_offset,
                    page_state
                )
        return y
