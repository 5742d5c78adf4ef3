"""Mixture-of-Experts: routed experts with dropless dispatch.

TPU-native counterpart of the reference MoE stack (MaxText/layers/moe.py:75
GateLogit, :205 RoutedMoE, :1490 RoutedAndSharedMoE; sparse matmul via
megablox gmm / ragged_dot / dense fallback). Here:

- ``router``: softmax or sigmoid scores, optional e-score bias (DeepSeek-V3),
  optional group-limited routing (n_routing_groups / topk_routing_group),
  aux load-balance loss.
- ``sparse`` path: sort-by-expert + ``jax.lax.ragged_dot`` grouped matmuls —
  XLA lowers these onto the MXU without materializing per-expert copies.
- ``dense`` path: einsum over all experts (exact same math, O(E/k) more
  FLOPs) used on CPU/interpret and for tiny configs.
- shared experts (always-on) fused as an extra gated MLP.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.models.layers import ACTIVATIONS, DenseGeneral, MlpBlock
from maxtext_indextts2_tpu.parallel.sharding import shard


class RoutedMoE(nn.Module):
    cfg: Config
    mesh: Any = None

    @nn.compact
    def __call__(self, inputs: jax.Array, deterministic: bool = True):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        b, s, e = inputs.shape
        n_exp, k = cfg.num_experts, cfg.num_experts_per_tok
        m = cfg.moe_mlp_dim

        # ---------------- router (float32 for stable routing)
        gate_logits = DenseGeneral(
            features=n_exp,
            kernel_axes=("embed", None),
            dtype=jnp.float32,
            weight_dtype=jnp.dtype(cfg.weight_dtype),
            matmul_precision=cfg.matmul_precision,
            name="gate",
        )(inputs.astype(jnp.float32))

        if cfg.routed_score_func == "sigmoid":
            scores = jax.nn.sigmoid(gate_logits)
        else:
            scores = jax.nn.softmax(gate_logits, axis=-1)

        select_scores = scores
        if cfg.routed_bias:
            # DeepSeek-V3 aux-loss-free balancing bias: used for selection
            # only, not for the combine weights.
            bias = self.param(
                "gate_bias",
                nn.with_logical_partitioning(jax.nn.initializers.zeros, (None,)),
                (n_exp,),
                jnp.float32,
            )
            select_scores = scores + bias

        if cfg.n_routing_groups > 0:
            select_scores = self._group_limited(select_scores)

        top_scores, top_idx = jax.lax.top_k(select_scores, k)
        # combine weights come from the unbiased scores
        top_w = jnp.take_along_axis(scores, top_idx, axis=-1)
        if cfg.normalize_topk_weights:
            top_w = top_w / jnp.maximum(
                jnp.sum(top_w, axis=-1, keepdims=True), 1e-9
            )
        top_w = top_w * cfg.routed_scaling_factor
        top_w = top_w.astype(dtype)

        # ---------------- load-balance loss (Switch/GShard style)
        one_hot = jax.nn.one_hot(top_idx, n_exp, dtype=jnp.float32)  # [B,S,k,E]
        tokens_per_expert = jnp.mean(jnp.sum(one_hot, axis=2), axis=(0, 1))  # [E]
        prob_per_expert = jnp.mean(scores, axis=(0, 1))
        lb_loss = n_exp * jnp.sum(tokens_per_expert * prob_per_expert) / k

        # ---------------- expert weights
        w_init = nn.with_logical_partitioning(
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal", in_axis=1, out_axis=2),
            ("exp", "embed", "mlp"),
        )
        wo_init = nn.with_logical_partitioning(
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal", in_axis=1, out_axis=2),
            ("exp", "mlp", "embed"),
        )
        wdt = jnp.dtype(cfg.weight_dtype)
        int8_experts = cfg.quantization == "int8w_serve"
        if int8_experts:
            # serving structure: int8 weights + per-(expert, out-channel)
            # f32 scales, filled offline by quantize_params_for_serving
            # (tools/quantize_checkpoint.py). Halves expert HBM traffic —
            # the binding constraint in the weight-streaming decode regime
            # (benchmarks/moe_gmm.py: int8 ragged_dot == bf16 speed, so the
            # win is bytes, not FLOPs).
            zi = nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("exp", "embed", "mlp")
            )
            zo = nn.with_logical_partitioning(
                nn.initializers.zeros_init(), ("exp", "mlp", "embed")
            )
            zsi = nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("exp", None, "mlp")
            )
            zso = nn.with_logical_partitioning(
                nn.initializers.ones_init(), ("exp", None, "embed")
            )
            wi_0 = self.param("wi_0", zi, (n_exp, e, m), jnp.int8)
            wi_1 = self.param("wi_1", zi, (n_exp, e, m), jnp.int8)
            wo = self.param("wo", zo, (n_exp, m, e), jnp.int8)
            wi_0_s = self.param("wi_0_scale", zsi, (n_exp, 1, m), jnp.float32)
            wi_1_s = self.param("wi_1_scale", zsi, (n_exp, 1, m), jnp.float32)
            wo_s = self.param("wo_scale", zso, (n_exp, 1, e), jnp.float32)
            scales = (wi_0_s, wi_1_s, wo_s)
        else:
            wi_0 = self.param("wi_0", w_init, (n_exp, e, m), wdt)
            wi_1 = self.param("wi_1", w_init, (n_exp, e, m), wdt)
            wo = self.param("wo", wo_init, (n_exp, m, e), wdt)
            scales = None

        use_sparse = cfg.sparse_matmul and jax.default_backend() == "tpu"
        if use_sparse:
            out = self._sparse_experts(
                inputs, top_idx, top_w, wi_0, wi_1, wo, dtype, scales=scales
            )
        elif int8_experts:
            # dense fallback: dequantize and reuse the einsum path (CPU /
            # tiny configs; capability-exact, perf-irrelevant here)
            out = self._dense_experts(
                inputs, top_idx, top_w,
                wi_0.astype(jnp.float32) * wi_0_s,
                wi_1.astype(jnp.float32) * wi_1_s,
                wo.astype(jnp.float32) * wo_s,
                dtype,
            )
        else:
            out = self._dense_experts(
                inputs, top_idx, top_w, wi_0, wi_1, wo, dtype
            )

        if cfg.shared_experts > 0:
            out = out + MlpBlock(
                intermediate_dim=m * cfg.shared_experts,
                activations=cfg.mlp_activations,
                dtype=dtype,
                weight_dtype=wdt,
                matmul_precision=cfg.matmul_precision,
                name="shared_experts",
            )(inputs, deterministic=deterministic)

        out = shard(out, "activation_batch", "activation_length", "activation_embed")
        return out, lb_loss

    # ------------------------------------------------------------- routing
    def _group_limited(self, scores: jax.Array) -> jax.Array:
        """DeepSeek group-limited routing: keep only experts inside the
        top ``topk_routing_group`` groups (by each group's top-2 score sum)."""
        cfg = self.cfg
        g = cfg.n_routing_groups
        kg = cfg.topk_routing_group
        b, s, n = scores.shape
        grouped = scores.reshape(b, s, g, n // g)
        group_score = jnp.sum(jax.lax.top_k(grouped, 2)[0], axis=-1)  # [B,S,g]
        _, top_groups = jax.lax.top_k(group_score, kg)
        group_mask = jnp.sum(jax.nn.one_hot(top_groups, g, dtype=scores.dtype), axis=2)
        mask = jnp.repeat(group_mask, n // g, axis=-1)
        return jnp.where(mask > 0, scores, -jnp.inf)

    # ------------------------------------------------------------- compute
    def _dense_experts(self, x, top_idx, top_w, wi_0, wi_1, wo, dtype):
        cfg = self.cfg
        acts = cfg.mlp_activations
        x = x.astype(dtype)
        combine = jnp.sum(
            jax.nn.one_hot(top_idx, cfg.num_experts, dtype=dtype)
            * top_w[..., None],
            axis=2,
        )  # [B,S,E_experts] routing weight per (token, expert)
        if cfg.moe_weight_on_input:
            # llama4: weight the expert INPUT; sum expert outputs masked to
            # the selected experts.
            xw = x[:, :, None, :] * combine[..., None]  # [B,S,X,E]
            h0 = jnp.einsum("bsxe,xem->bsxm", xw, wi_0.astype(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
            h1 = jnp.einsum("bsxe,xem->bsxm", xw, wi_1.astype(dtype),
                            preferred_element_type=jnp.float32).astype(dtype)
            h = ACTIVATIONS[acts[0]](h0) * (h1 if len(acts) > 1 else 1.0)
            o = jnp.einsum("bsxm,xme->bsxe", h, wo.astype(dtype),
                           preferred_element_type=jnp.float32).astype(dtype)
            mask = (combine != 0).astype(dtype)
            return jnp.einsum("bsxe,bsx->bse", o, mask,
                              preferred_element_type=jnp.float32).astype(dtype)
        h0 = jnp.einsum("bse,xem->bsxm", x, wi_0.astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        h1 = jnp.einsum("bse,xem->bsxm", x, wi_1.astype(dtype),
                        preferred_element_type=jnp.float32).astype(dtype)
        h = ACTIVATIONS[acts[0]](h0) * (h1 if len(acts) > 1 else 1.0)
        o = jnp.einsum("bsxm,xme->bsxe", h, wo.astype(dtype),
                       preferred_element_type=jnp.float32).astype(dtype)
        return jnp.einsum("bsxe,bsx->bse", o, combine,
                          preferred_element_type=jnp.float32).astype(dtype)

    def _sparse_experts(self, x, top_idx, top_w, wi_0, wi_1, wo, dtype,
                        scales=None):
        """Dropless dispatch: sort token-replicas by expert, grouped matmuls
        via ragged_dot, weighted scatter back.

        ``scales`` (wi_0_s, wi_1_s, wo_s — [E,1,out]) marks int8 serving
        weights: activations are dynamically row-quantized to int8 so the
        grouped matmuls run int8 x int8 (same MXU speed as bf16 at these
        shapes, half the weight HBM bytes — benchmarks/moe_gmm.py), then
        rescaled by row_scale x expert-channel scale."""
        cfg = self.cfg
        b, s, e = x.shape
        k = cfg.num_experts_per_tok
        n_exp = cfg.num_experts
        t = b * s

        x_flat = x.reshape(t, e).astype(dtype)
        expert_flat = top_idx.reshape(t * k)  # expert of each (token, slot)
        w_flat = top_w.reshape(t * k)

        order = jnp.argsort(expert_flat)  # stable
        token_of = order // k
        x_sorted = jnp.take(x_flat, token_of, axis=0)
        if cfg.moe_weight_on_input:
            x_sorted = x_sorted * jnp.take(w_flat, order)[:, None]
        group_sizes = jnp.bincount(expert_flat, length=n_exp)

        if scales is not None:
            wi_0_s, wi_1_s, wo_s = scales
            expert_sorted = jnp.take(expert_flat, order)  # [T]

            def q_rows(v):
                amax = jnp.max(jnp.abs(v.astype(jnp.float32)), axis=-1,
                               keepdims=True)
                sc = jnp.maximum(amax, 1e-9) / 127.0
                return jnp.round(v.astype(jnp.float32) / sc).astype(jnp.int8), sc

            def rdot_int8(v_int8, row_scale, w_q, w_s):
                out = jax.lax.ragged_dot(
                    v_int8, w_q, group_sizes,
                    preferred_element_type=jnp.int32,
                ).astype(jnp.float32)
                # per-row activation scale x this row's expert's channel scale
                return out * row_scale * jnp.take(w_s[:, 0], expert_sorted,
                                                  axis=0)

            xq, xs = q_rows(x_sorted)
            h0 = rdot_int8(xq, xs, wi_0, wi_0_s).astype(dtype)
            h1 = rdot_int8(xq, xs, wi_1, wi_1_s).astype(dtype)
            acts = cfg.mlp_activations
            h = ACTIVATIONS[acts[0]](h0) * (h1 if len(acts) > 1 else 1.0)
            hq, hs = q_rows(h)
            o_sorted = rdot_int8(hq, hs, wo, wo_s).astype(dtype)
        else:
            h0 = jax.lax.ragged_dot(
                x_sorted, wi_0.astype(dtype), group_sizes,
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            h1 = jax.lax.ragged_dot(
                x_sorted, wi_1.astype(dtype), group_sizes,
                preferred_element_type=jnp.float32,
            ).astype(dtype)
            acts = cfg.mlp_activations
            h = ACTIVATIONS[acts[0]](h0) * (h1 if len(acts) > 1 else 1.0)
            o_sorted = jax.lax.ragged_dot(
                h, wo.astype(dtype), group_sizes,
                preferred_element_type=jnp.float32,
            ).astype(dtype)

        # llama4 scales the expert INPUT by the routing weight instead of
        # the output (nonlinear experts make the two differ); both are a
        # single row-scale on the sorted token stream.
        if not cfg.moe_weight_on_input:
            o_sorted = o_sorted * jnp.take(w_flat, order)[:, None]
        out_flat = jnp.zeros((t, e), dtype=jnp.float32).at[token_of].add(o_sorted)
        return out_flat.astype(dtype).reshape(b, s, e)
