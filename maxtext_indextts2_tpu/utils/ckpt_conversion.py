"""HF <-> framework checkpoint conversion.

Reference: MaxText/utils/ckpt_conversion/{to_maxtext.py:207,
to_huggingface.py:191} + per-family converters (llama_or_mistral_ckpt.py
etc.). One table-driven converter covers the llama-family layout
(llama2/3/3.1, mistral, qwen3); weights land directly in the scanned
[L, ...] parameter layout.

Correctness bar: logits parity against the HF torch forward
(tests/test_ckpt_conversion.py), mirroring the reference's
forward_pass_logit_checker.
"""

from __future__ import annotations

import numpy as np

from maxtext_indextts2_tpu.config import Config


def _t(x) -> np.ndarray:
    import torch

    if isinstance(x, np.ndarray):
        return x
    return x.detach().to(torch.float32).cpu().numpy()


def convert_hf_llama_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF llama/mistral/qwen3-style state dict -> framework params (scanned).

    Returns {"params": {...}} matching Transformer with scan_layers=True.
    """
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim

    sd = {k: v for k, v in state_dict.items()}

    def get(name):
        return _t(sd[name])

    def stack(fmt, transform):
        return np.stack([transform(get(fmt.format(i))) for i in range(L)], axis=0)

    layers = {
        "self_attention_0": {
            "query": {"kernel": stack(
                "model.layers.{}.self_attn.q_proj.weight",
                lambda w: w.T.reshape(E, nq, hd))},
            "key": {"kernel": stack(
                "model.layers.{}.self_attn.k_proj.weight",
                lambda w: w.T.reshape(E, nkv, hd))},
            "value": {"kernel": stack(
                "model.layers.{}.self_attn.v_proj.weight",
                lambda w: w.T.reshape(E, nkv, hd))},
            "out": {"kernel": stack(
                "model.layers.{}.self_attn.o_proj.weight",
                lambda w: w.T.reshape(nq, hd, E))},
        },
        "pre_self_attention_norm_0": {
            "scale": stack("model.layers.{}.input_layernorm.weight", lambda w: w)
        },
        "pre_mlp_norm_0": {
            "scale": stack("model.layers.{}.post_attention_layernorm.weight", lambda w: w)
        },
    }
    # dense MLP (absent for MoE variants, whose converters add moe_0 instead)
    if "model.layers.0.mlp.gate_proj.weight" in sd:
        layers["mlp_0"] = {
            "wi_0": {"kernel": stack("model.layers.{}.mlp.gate_proj.weight", lambda w: w.T)},
            "wi_1": {"kernel": stack("model.layers.{}.mlp.up_proj.weight", lambda w: w.T)},
            "wo": {"kernel": stack("model.layers.{}.mlp.down_proj.weight", lambda w: w.T)},
        }
    # qwen3 per-head q/k norms
    if "model.layers.0.self_attn.q_norm.weight" in sd:
        layers["self_attention_0"]["query_norm"] = {
            "scale": stack("model.layers.{}.self_attn.q_norm.weight", lambda w: w)
        }
        layers["self_attention_0"]["key_norm"] = {
            "scale": stack("model.layers.{}.self_attn.k_norm.weight", lambda w: w)
        }

    params = {
        "token_embedder": {"embedding": _pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("model.norm.weight")},
    }
    if not cfg.logits_via_embedding:
        lm_head = sd.get("lm_head.weight")
        if lm_head is None:  # tied embeddings
            lm_head = sd["model.embed_tokens.weight"]
        params["logits_dense"] = {"kernel": _pad_vocab(_t(lm_head), cfg.vocab_size).T.copy()}
    return {"params": params}


def _pad_vocab(emb: np.ndarray, vocab_size: int) -> np.ndarray:
    if emb.shape[0] == vocab_size:
        return emb
    if emb.shape[0] > vocab_size:
        return emb[:vocab_size]
    out = np.zeros((vocab_size, emb.shape[1]), emb.dtype)
    out[: emb.shape[0]] = emb
    return out


def convert_framework_to_hf_llama(
    params: dict, cfg: Config, hf_vocab_size: int | None = None
) -> dict:
    """Inverse: framework (scanned) params -> HF llama-style state dict.

    Also covers mistral (identical naming) and qwen3 (per-head q/k norms
    exported when present) — the reference's to_huggingface.py +
    llama_mistral_mixtral_orbax_to_hf export surface. ``hf_vocab_size``
    trims rows the import path padded."""
    import flax

    p = params.get("params", params)
    flat = flax.traverse_util.flatten_dict(p)
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    v = hf_vocab_size or cfg.vocab_size

    def g(*path):
        return np.asarray(flat[path])

    sd = {
        "model.embed_tokens.weight": g("token_embedder", "embedding")[:v],
        "model.norm.weight": g("decoder_norm", "scale"),
    }
    if ("logits_dense", "kernel") in flat:
        sd["lm_head.weight"] = g("logits_dense", "kernel").T[:v].copy()
    has_qk_norm = ("decoder", "layers", "self_attention_0", "query_norm", "scale") in flat
    for i in range(L):
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "query", "kernel")[i]
            .reshape(E, nq * hd).T.copy()
        )
        sd[pre + "self_attn.k_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "key", "kernel")[i]
            .reshape(E, nkv * hd).T.copy()
        )
        sd[pre + "self_attn.v_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "value", "kernel")[i]
            .reshape(E, nkv * hd).T.copy()
        )
        sd[pre + "self_attn.o_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "out", "kernel")[i]
            .reshape(nq * hd, E).T.copy()
        )
        if has_qk_norm:
            sd[pre + "self_attn.q_norm.weight"] = g(
                "decoder", "layers", "self_attention_0", "query_norm", "scale")[i]
            sd[pre + "self_attn.k_norm.weight"] = g(
                "decoder", "layers", "self_attention_0", "key_norm", "scale")[i]
        sd[pre + "mlp.gate_proj.weight"] = g("decoder", "layers", "mlp_0", "wi_0", "kernel")[i].T.copy()
        sd[pre + "mlp.up_proj.weight"] = g("decoder", "layers", "mlp_0", "wi_1", "kernel")[i].T.copy()
        sd[pre + "mlp.down_proj.weight"] = g("decoder", "layers", "mlp_0", "wo", "kernel")[i].T.copy()
        sd[pre + "input_layernorm.weight"] = g(
            "decoder", "layers", "pre_self_attention_norm_0", "scale")[i]
        sd[pre + "post_attention_layernorm.weight"] = g(
            "decoder", "layers", "pre_mlp_norm_0", "scale")[i]
    return sd


def _export_gemma_grouped(
    params: dict, cfg: Config, group: int, qk_norm: bool,
    hf_vocab_size: int | None,
) -> dict:
    """Shared gemma2 (group=2) / gemma3 (group=6, qk norms) export: framework
    scan units of `group` sublayers -> HF flat layer list, sandwich norms,
    tied embeddings (no lm_head) — the reference to_huggingface.py surface."""
    import flax

    p = params.get("params", params)
    flat = flax.traverse_util.flatten_dict(p)
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    v = hf_vocab_size or cfg.vocab_size

    def g(*path):
        return np.asarray(flat[path])

    sd = {
        "model.embed_tokens.weight": g("token_embedder", "embedding")[:v],
        "model.norm.weight": g("decoder_norm", "scale"),
    }
    for i in range(L):
        u, sub = divmod(i, group)
        a = f"self_attention_{sub}"
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"] = (
            g("decoder", "layers", a, "query", "kernel")[u]
            .reshape(E, nq * hd).T.copy()
        )
        sd[pre + "self_attn.k_proj.weight"] = (
            g("decoder", "layers", a, "key", "kernel")[u]
            .reshape(E, nkv * hd).T.copy()
        )
        sd[pre + "self_attn.v_proj.weight"] = (
            g("decoder", "layers", a, "value", "kernel")[u]
            .reshape(E, nkv * hd).T.copy()
        )
        sd[pre + "self_attn.o_proj.weight"] = (
            g("decoder", "layers", a, "out", "kernel")[u]
            .reshape(nq * hd, E).T.copy()
        )
        if qk_norm:
            sd[pre + "self_attn.q_norm.weight"] = g("decoder", "layers", a, "query_norm", "scale")[u]
            sd[pre + "self_attn.k_norm.weight"] = g("decoder", "layers", a, "key_norm", "scale")[u]
        sd[pre + "mlp.gate_proj.weight"] = g("decoder", "layers", f"mlp_{sub}", "wi_0", "kernel")[u].T.copy()
        sd[pre + "mlp.up_proj.weight"] = g("decoder", "layers", f"mlp_{sub}", "wi_1", "kernel")[u].T.copy()
        sd[pre + "mlp.down_proj.weight"] = g("decoder", "layers", f"mlp_{sub}", "wo", "kernel")[u].T.copy()
        sd[pre + "input_layernorm.weight"] = g(
            "decoder", "layers", f"pre_self_attention_norm_{sub}", "scale")[u]
        sd[pre + "post_attention_layernorm.weight"] = g(
            "decoder", "layers", f"post_self_attention_norm_{sub}", "scale")[u]
        sd[pre + "pre_feedforward_layernorm.weight"] = g(
            "decoder", "layers", f"pre_mlp_norm_{sub}", "scale")[u]
        sd[pre + "post_feedforward_layernorm.weight"] = g(
            "decoder", "layers", f"post_ffw_norm_{sub}", "scale")[u]
    return sd


def convert_framework_to_hf_gemma2(
    params: dict, cfg: Config, hf_vocab_size: int | None = None
) -> dict:
    """Inverse of convert_hf_gemma2_to_framework."""
    return _export_gemma_grouped(params, cfg, 2, False, hf_vocab_size)


def convert_framework_to_hf_gemma3(
    params: dict, cfg: Config, hf_vocab_size: int | None = None
) -> dict:
    """Inverse of convert_hf_gemma3_to_framework (text model)."""
    return _export_gemma_grouped(params, cfg, 6, True, hf_vocab_size)


def convert_framework_to_hf_mixtral(
    params: dict, cfg: Config, hf_vocab_size: int | None = None
) -> dict:
    """Inverse: framework Mixtral params -> HF state dict (reference
    llama_mistral_mixtral_orbax_to_hf covers the same export direction).
    ``hf_vocab_size`` trims rows the import path padded."""
    import flax

    p = params.get("params", params)
    flat = flax.traverse_util.flatten_dict(p)
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    n_exp = cfg.num_experts
    v = hf_vocab_size or cfg.vocab_size

    def g(*path):
        return np.asarray(flat[path])

    sd = {
        "model.embed_tokens.weight": g("token_embedder", "embedding")[:v],
        "model.norm.weight": g("decoder_norm", "scale"),
        "lm_head.weight": g("logits_dense", "kernel").T[:v].copy(),
    }
    for i in range(L):
        pre = f"model.layers.{i}."
        sd[pre + "self_attn.q_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "query", "kernel")[i]
            .reshape(E, nq * hd).T.copy()
        )
        sd[pre + "self_attn.k_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "key", "kernel")[i]
            .reshape(E, nkv * hd).T.copy()
        )
        sd[pre + "self_attn.v_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "value", "kernel")[i]
            .reshape(E, nkv * hd).T.copy()
        )
        sd[pre + "self_attn.o_proj.weight"] = (
            g("decoder", "layers", "self_attention_0", "out", "kernel")[i]
            .reshape(nq * hd, E).T.copy()
        )
        sd[pre + "block_sparse_moe.gate.weight"] = (
            g("decoder", "layers", "moe_0", "gate", "kernel")[i].T.copy()
        )
        for e in range(n_exp):
            epre = f"{pre}block_sparse_moe.experts.{e}."
            sd[epre + "w1.weight"] = g("decoder", "layers", "moe_0", "wi_0")[i, e].T.copy()
            sd[epre + "w3.weight"] = g("decoder", "layers", "moe_0", "wi_1")[i, e].T.copy()
            sd[epre + "w2.weight"] = g("decoder", "layers", "moe_0", "wo")[i, e].T.copy()
        sd[pre + "input_layernorm.weight"] = g(
            "decoder", "layers", "pre_self_attention_norm_0", "scale")[i]
        sd[pre + "post_attention_layernorm.weight"] = g(
            "decoder", "layers", "pre_mlp_norm_0", "scale")[i]
    return sd


# decoder_block -> (HF->framework, framework->HF or None)
_CONVERTERS = {
    "llama2": ("convert_hf_llama_to_framework", "convert_framework_to_hf_llama"),
    "llama3": ("convert_hf_llama_to_framework", "convert_framework_to_hf_llama"),
    "mistral": ("convert_hf_llama_to_framework", "convert_framework_to_hf_llama"),
    "qwen3": ("convert_hf_llama_to_framework", "convert_framework_to_hf_llama"),
    "gemma": ("convert_hf_gemma_to_framework", "convert_framework_to_hf_llama"),
    "gemma2": ("convert_hf_gemma2_to_framework", "convert_framework_to_hf_gemma2"),
    "gemma3": ("convert_hf_gemma3_to_framework", "convert_framework_to_hf_gemma3"),
    "mixtral": ("convert_hf_mixtral_to_framework", "convert_framework_to_hf_mixtral"),
    "deepseek": ("convert_hf_deepseek_to_framework", None),
    "gpt3": ("convert_hf_gpt2_to_framework", None),
    # source-format alias: paxml tensorstore layout of the same family
    "gpt3_paxml": ("convert_paxml_gpt3_to_framework", None),
    "llama4": ("convert_hf_llama4_to_framework", None),
    "qwen3_moe": ("convert_hf_qwen3_moe_to_framework", None),
}


def get_converter(decoder_block: str, direction: str = "to_framework"):
    """Converter fn for a decoder_block family and direction
    ('to_framework' | 'to_hf'). Raises on unsupported combinations."""
    if decoder_block not in _CONVERTERS:
        raise ValueError(
            f"no converters for decoder_block={decoder_block}; "
            f"supported: {sorted(_CONVERTERS)}"
        )
    to_fw, to_hf = _CONVERTERS[decoder_block]
    name = to_fw if direction == "to_framework" else to_hf
    if name is None:
        raise ValueError(f"{decoder_block} has no {direction} converter yet")
    return globals()[name]


def hf_config_for(cfg: Config, hf_vocab_size: int | None = None):
    """A transformers config matching the exported weights, so the output
    directory loads with from_pretrained. None for families without an HF
    config counterpart here."""
    import transformers as tf

    v = hf_vocab_size or cfg.vocab_size
    common = dict(
        vocab_size=v,
        hidden_size=cfg.emb_dim,
        intermediate_size=cfg.mlp_dim,
        num_hidden_layers=cfg.num_decoder_layers,
        num_attention_heads=cfg.num_query_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        max_position_embeddings=cfg.max_target_length,
        rope_theta=cfg.rope_max_timescale,
        tie_word_embeddings=bool(cfg.logits_via_embedding),
    )
    block = cfg.decoder_block
    if block in ("llama2", "llama3", "gemma"):
        return tf.LlamaConfig(**common)
    if block == "mistral":
        return tf.MistralConfig(
            **{k: v for k, v in common.items() if k != "head_dim"},
            sliding_window=cfg.sliding_window_size or None,
        )
    if block == "qwen3":
        return tf.Qwen3Config(**common)
    if block == "mixtral":
        return tf.MixtralConfig(
            **common,
            num_local_experts=cfg.num_experts,
            num_experts_per_tok=cfg.num_experts_per_tok,
            sliding_window=cfg.sliding_window_size or None,
        )
    if block == "gemma2":
        return tf.Gemma2Config(
            **common,
            sliding_window=cfg.sliding_window_size or 4096,
            query_pre_attn_scalar=cfg.query_pre_attn_scalar or cfg.head_dim,
            attn_logit_softcapping=cfg.attn_logits_soft_cap or None,
            final_logit_softcapping=cfg.final_logits_soft_cap or None,
        )
    if block == "gemma3":
        return tf.Gemma3TextConfig(
            **common,
            sliding_window=cfg.sliding_window_size or 1024,
            query_pre_attn_scalar=cfg.query_pre_attn_scalar or cfg.head_dim,
            rope_scaling=None,
        )
    return None


def main(argv=None):
    """CLI: HF checkpoint dir <-> params-only Orbax ckpt, both directions.

    to_framework (default): --hf_path <dir> --out_path <orbax> --model_name X
    to_hf: --direction to_hf --ckpt_path <orbax> --out_path <dir>
           --model_name X  (writes pytorch_model.bin + the family's HF
           config if transformers can construct one)
    """
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--hf_path")
    ap.add_argument("--ckpt_path")
    ap.add_argument("--out_path", required=True)
    ap.add_argument("--model_name", required=True)
    ap.add_argument("--direction", default="to_framework",
                    choices=["to_framework", "to_hf"])
    ap.add_argument("--hf_vocab_size", type=int, default=None)
    args = ap.parse_args(argv)

    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config([f"model_name={args.model_name}"])
    conv = get_converter(cfg.decoder_block, args.direction)

    if args.direction == "to_framework":
        from transformers import AutoModelForCausalLM

        from maxtext_indextts2_tpu.train.checkpointing import save_params_only

        assert args.hf_path, "--hf_path required for to_framework"
        hf = AutoModelForCausalLM.from_pretrained(args.hf_path)
        params = conv(hf.state_dict(), cfg)
        save_params_only(args.out_path, params["params"])
        print(f"converted {args.hf_path} -> {args.out_path}")
    else:
        import os

        import torch

        from maxtext_indextts2_tpu.train.checkpointing import load_params_only

        assert args.ckpt_path, "--ckpt_path required for to_hf"
        params = load_params_only(args.ckpt_path)
        sd = conv({"params": params}, cfg, hf_vocab_size=args.hf_vocab_size)
        os.makedirs(args.out_path, exist_ok=True)
        torch.save(
            {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
            os.path.join(args.out_path, "pytorch_model.bin"),
        )
        hf_cfg = hf_config_for(cfg, args.hf_vocab_size)
        if hf_cfg is not None:
            hf_cfg.save_pretrained(args.out_path)
        print(f"exported {args.ckpt_path} -> {args.out_path}/pytorch_model.bin "
              f"({len(sd)} tensors"
              f"{', +config.json' if hf_cfg is not None else ''})")


if __name__ == "__main__":
    main()


def convert_hf_gemma2_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF Gemma2 state dict -> framework params (gemma2 BlockStyle: scan
    units of 2 sublayers [local_sliding, global], sandwich norms, tied
    embeddings)."""
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    units = L // 2

    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack(sub, fmt, transform):
        # sublayer `sub` of unit u is HF layer 2u+sub
        return np.stack(
            [transform(get(fmt.format(2 * u + sub))) for u in range(units)], axis=0
        )

    layers = {}
    for sub in (0, 1):
        layers[f"self_attention_{sub}"] = {
            "query": {"kernel": stack(sub, "model.layers.{}.self_attn.q_proj.weight",
                                      lambda w: w.T.reshape(E, nq, hd))},
            "key": {"kernel": stack(sub, "model.layers.{}.self_attn.k_proj.weight",
                                    lambda w: w.T.reshape(E, nkv, hd))},
            "value": {"kernel": stack(sub, "model.layers.{}.self_attn.v_proj.weight",
                                      lambda w: w.T.reshape(E, nkv, hd))},
            "out": {"kernel": stack(sub, "model.layers.{}.self_attn.o_proj.weight",
                                    lambda w: w.T.reshape(nq, hd, E))},
        }
        layers[f"mlp_{sub}"] = {
            "wi_0": {"kernel": stack(sub, "model.layers.{}.mlp.gate_proj.weight", lambda w: w.T)},
            "wi_1": {"kernel": stack(sub, "model.layers.{}.mlp.up_proj.weight", lambda w: w.T)},
            "wo": {"kernel": stack(sub, "model.layers.{}.mlp.down_proj.weight", lambda w: w.T)},
        }
        layers[f"pre_self_attention_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.input_layernorm.weight", lambda w: w)}
        layers[f"post_self_attention_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.post_attention_layernorm.weight", lambda w: w)}
        layers[f"pre_mlp_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.pre_feedforward_layernorm.weight", lambda w: w)}
        layers[f"post_ffw_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.post_feedforward_layernorm.weight", lambda w: w)}

    return {"params": {
        "token_embedder": {"embedding": _pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("model.norm.weight")},
    }}


def convert_hf_mixtral_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF Mixtral state dict -> framework params: llama attention layout +
    per-layer stacked expert weights (w1->wi_0 gate, w3->wi_1 up, w2->wo)."""
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    n_exp = cfg.num_experts
    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack(fmt, transform):
        return np.stack([transform(get(fmt.format(i))) for i in range(L)], axis=0)

    def stack_experts(w_name):
        # [L, n_exp, in, out]
        return np.stack([
            np.stack([
                _t(sd[f"model.layers.{i}.block_sparse_moe.experts.{e}.{w_name}.weight"]).T
                for e in range(n_exp)
            ], axis=0)
            for i in range(L)
        ], axis=0)

    layers = {
        "self_attention_0": {
            "query": {"kernel": stack("model.layers.{}.self_attn.q_proj.weight",
                                      lambda w: w.T.reshape(E, nq, hd))},
            "key": {"kernel": stack("model.layers.{}.self_attn.k_proj.weight",
                                    lambda w: w.T.reshape(E, nkv, hd))},
            "value": {"kernel": stack("model.layers.{}.self_attn.v_proj.weight",
                                      lambda w: w.T.reshape(E, nkv, hd))},
            "out": {"kernel": stack("model.layers.{}.self_attn.o_proj.weight",
                                    lambda w: w.T.reshape(nq, hd, E))},
        },
        "moe_0": {
            "gate": {"kernel": stack("model.layers.{}.block_sparse_moe.gate.weight",
                                     lambda w: w.T)},
            # RoutedMoE holds expert weights as direct [n_exp, in, out] params
            "wi_0": stack_experts("w1"),
            "wi_1": stack_experts("w3"),
            "wo": stack_experts("w2"),
        },
        "pre_self_attention_norm_0": {
            "scale": stack("model.layers.{}.input_layernorm.weight", lambda w: w)},
        "pre_mlp_norm_0": {
            "scale": stack("model.layers.{}.post_attention_layernorm.weight", lambda w: w)},
    }
    params = {
        "token_embedder": {"embedding": _pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("model.norm.weight")},
        "logits_dense": {"kernel": _pad_vocab(get("lm_head.weight"), cfg.vocab_size).T.copy()},
    }
    return {"params": params}


def convert_hf_deepseek_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF DeepseekV2/V3 (dense layers) -> framework MLA params.

    Maps q_a/q_b (or q_proj), kv_a_proj_with_mqa, kv_b_proj, o_proj onto
    MLAttention's wq_a/wq_b/wkv_a/wkv_b/out; MoE layers are handled by the
    mixtral-style expert stacker when present (dense-only here)."""
    L = cfg.num_decoder_layers
    n = cfg.num_query_heads
    d_qk = cfg.qk_nope_head_dim + cfg.qk_rope_head_dim
    d_kv_out = cfg.qk_nope_head_dim + cfg.v_head_dim
    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack(fmt, transform):
        return np.stack([transform(get(fmt.format(i))) for i in range(L)], axis=0)

    attn = {
        "wkv_a": {"kernel": stack(
            "model.layers.{}.self_attn.kv_a_proj_with_mqa.weight", lambda w: w.T)},
        "kv_norm": {"scale": stack(
            "model.layers.{}.self_attn.kv_a_layernorm.weight", lambda w: w)},
        "wkv_b": {"kernel": stack(
            "model.layers.{}.self_attn.kv_b_proj.weight",
            lambda w: w.T.reshape(cfg.kv_lora_rank, n, d_kv_out))},
        "out": {"kernel": stack(
            "model.layers.{}.self_attn.o_proj.weight",
            lambda w: w.T.reshape(n, cfg.v_head_dim, -1))},
    }
    if cfg.q_lora_rank > 0:
        attn["wq_a"] = {"kernel": stack(
            "model.layers.{}.self_attn.q_a_proj.weight", lambda w: w.T)}
        attn["q_norm"] = {"scale": stack(
            "model.layers.{}.self_attn.q_a_layernorm.weight", lambda w: w)}
        attn["wq_b"] = {"kernel": stack(
            "model.layers.{}.self_attn.q_b_proj.weight",
            lambda w: w.T.reshape(cfg.q_lora_rank, n, d_qk))}
    else:
        attn["wq"] = {"kernel": stack(
            "model.layers.{}.self_attn.q_proj.weight",
            lambda w: w.T.reshape(-1, n, d_qk))}

    layers = {
        "self_attention_0": attn,
        "mlp_0": {
            "wi_0": {"kernel": stack("model.layers.{}.mlp.gate_proj.weight", lambda w: w.T)},
            "wi_1": {"kernel": stack("model.layers.{}.mlp.up_proj.weight", lambda w: w.T)},
            "wo": {"kernel": stack("model.layers.{}.mlp.down_proj.weight", lambda w: w.T)},
        },
        "pre_self_attention_norm_0": {
            "scale": stack("model.layers.{}.input_layernorm.weight", lambda w: w)},
        "pre_mlp_norm_0": {
            "scale": stack("model.layers.{}.post_attention_layernorm.weight", lambda w: w)},
    }
    params = {
        "token_embedder": {"embedding": _pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("model.norm.weight")},
        "logits_dense": {"kernel": _pad_vocab(get("lm_head.weight"), cfg.vocab_size).T.copy()},
    }
    return {"params": params}


def convert_hf_gemma3_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF Gemma3 text model -> framework params (gemma3 BlockStyle: 6-sublayer
    scan units [5x local_sliding, global], qk-norms, sandwich norms)."""
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    group = 6
    units = L // group
    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack(sub, fmt, transform):
        return np.stack(
            [transform(get(fmt.format(group * u + sub))) for u in range(units)], axis=0
        )

    layers = {}
    for sub in range(group):
        layers[f"self_attention_{sub}"] = {
            "query": {"kernel": stack(sub, "model.layers.{}.self_attn.q_proj.weight",
                                      lambda w: w.T.reshape(E, nq, hd))},
            "key": {"kernel": stack(sub, "model.layers.{}.self_attn.k_proj.weight",
                                    lambda w: w.T.reshape(E, nkv, hd))},
            "value": {"kernel": stack(sub, "model.layers.{}.self_attn.v_proj.weight",
                                      lambda w: w.T.reshape(E, nkv, hd))},
            "out": {"kernel": stack(sub, "model.layers.{}.self_attn.o_proj.weight",
                                    lambda w: w.T.reshape(nq, hd, E))},
            "query_norm": {"scale": stack(sub, "model.layers.{}.self_attn.q_norm.weight",
                                          lambda w: w)},
            "key_norm": {"scale": stack(sub, "model.layers.{}.self_attn.k_norm.weight",
                                        lambda w: w)},
        }
        layers[f"mlp_{sub}"] = {
            "wi_0": {"kernel": stack(sub, "model.layers.{}.mlp.gate_proj.weight", lambda w: w.T)},
            "wi_1": {"kernel": stack(sub, "model.layers.{}.mlp.up_proj.weight", lambda w: w.T)},
            "wo": {"kernel": stack(sub, "model.layers.{}.mlp.down_proj.weight", lambda w: w.T)},
        }
        layers[f"pre_self_attention_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.input_layernorm.weight", lambda w: w)}
        layers[f"post_self_attention_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.post_attention_layernorm.weight", lambda w: w)}
        layers[f"pre_mlp_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.pre_feedforward_layernorm.weight", lambda w: w)}
        layers[f"post_ffw_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.post_feedforward_layernorm.weight", lambda w: w)}

    return {"params": {
        "token_embedder": {"embedding": _pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("model.norm.weight")},
    }}


def convert_hf_gemma_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF Gemma (v1) state dict -> framework params.

    Gemma1 shares llama's tensor layout (same HF names, single sublayer,
    pre-norms only); the gemma-specific behavior — (1+w) RMSNorm convention,
    sqrt(d) embedding scaling, gelu MLP, tied unembedding — lives in the
    gemma BlockStyle + FAMILY_CONFIG_DEFAULTS, not in the weights
    (reference: MaxText/MaxText/convert_gemma_chkpt.py).
    """
    return convert_hf_llama_to_framework(state_dict, cfg)


def convert_hf_gpt2_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF GPT-2 state dict -> framework gpt3-family params (scanned).

    Validates the gpt3 BlockStyle end to end: LayerNorm (mean+bias), fused
    qkv Conv1D split, attention/MLP biases, learned positional embeddings,
    tied unembedding (reference: MaxText/layers/gpt3.py:183 Gpt3DecoderLayer;
    HF Conv1D stores weights [in, out], so no transpose).
    """
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack(fmt, transform):
        return np.stack([transform(get(fmt.format(i))) for i in range(L)], axis=0)

    def qkv(part):  # part: 0=q, 1=k, 2=v  (c_attn fused [E, 3E])
        heads = nq if part == 0 else nkv
        return {
            "kernel": stack(
                "transformer.h.{}.attn.c_attn.weight",
                lambda w: w[:, part * E:(part + 1) * E].reshape(E, heads, hd)),
            "bias": stack(
                "transformer.h.{}.attn.c_attn.bias",
                lambda b: b[part * E:(part + 1) * E].reshape(heads, hd)),
        }

    layers = {
        "self_attention_0": {
            "query": qkv(0), "key": qkv(1), "value": qkv(2),
            "out": {
                "kernel": stack("transformer.h.{}.attn.c_proj.weight",
                                lambda w: w.reshape(nq, hd, E)),
                "bias": stack("transformer.h.{}.attn.c_proj.bias", lambda b: b),
            },
        },
        "mlp_0": {
            "wi": {"kernel": stack("transformer.h.{}.mlp.c_fc.weight", lambda w: w),
                   "bias": stack("transformer.h.{}.mlp.c_fc.bias", lambda b: b)},
            "wo": {"kernel": stack("transformer.h.{}.mlp.c_proj.weight", lambda w: w),
                   "bias": stack("transformer.h.{}.mlp.c_proj.bias", lambda b: b)},
        },
        "pre_self_attention_norm_0": {
            "scale": stack("transformer.h.{}.ln_1.weight", lambda w: w),
            "bias": stack("transformer.h.{}.ln_1.bias", lambda b: b),
        },
        "pre_mlp_norm_0": {
            "scale": stack("transformer.h.{}.ln_2.weight", lambda w: w),
            "bias": stack("transformer.h.{}.ln_2.bias", lambda b: b),
        },
    }
    return {"params": {
        "token_embedder": {"embedding": _pad_vocab(get("transformer.wte.weight"), cfg.vocab_size)},
        "position_embedder": {"embedding": _pad_vocab(
            get("transformer.wpe.weight"), cfg.max_target_length)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("transformer.ln_f.weight"),
                         "bias": get("transformer.ln_f.bias")},
    }}


def convert_paxml_gpt3_to_framework(get, cfg: Config) -> dict:
    """paxml-format GPT-3 (the MLPerf reference checkpoint) -> framework
    gpt3-family params (layers stacked on axis 0).

    ``get(name)`` returns the paxml variable for a dotted name like
    ``.params.lm.transformer.repeat.sub.x_layers_0.self_attention.combined_qkv.w``
    — callers bind it to a tensorstore reader (load_paxml_gpt3_checkpoint)
    or a dict (tests). Name map and axis conventions mirror the reference
    converter (MaxText/convert_gpt3_ckpt_from_paxml.py:109-186 keystr_map),
    re-laid for this repo's axis-0 layer stacking instead of MaxText's
    param_scan_axis=1:
      combined_qkv.w [L, 3, E, nq, hd] -> q/k/v kernels [L, E, nq, hd]
      post.w         [L, E, nq, hd]    -> out kernel    [L, nq, hd, E]
      ffn linear.w   [L, E, M]/[L, M, E] direct; norms [L, E] direct
      softmax.logits_ffn.linear.w [E, V] -> token embedding [V, E] (tied)
    """
    E = cfg.emb_dim
    nq, hd = cfg.num_query_heads, cfg.head_dim
    P = ".params.lm"
    X = P + ".transformer.repeat.sub.x_layers_0"

    def g(name):
        return np.asarray(get(name))

    def qkv(part):
        w = g(f"{X}.self_attention.combined_qkv.w")
        b = g(f"{X}.self_attention.combined_qkv.b")
        L = w.shape[0]
        return {
            "kernel": w[:, part].reshape(L, E, nq, hd),
            "bias": b[:, part].reshape(L, nq, hd),
        }

    out_w = g(f"{X}.self_attention.post.w")  # [L, E, nq, hd]
    layers = {
        "self_attention_0": {
            "query": qkv(0), "key": qkv(1), "value": qkv(2),
            "out": {
                "kernel": np.moveaxis(out_w, 1, -1),  # -> [L, nq, hd, E]
                "bias": g(f"{X}.self_attention.post.b"),
            },
        },
        "mlp_0": {
            "wi": {"kernel": g(f"{X}.ff_layer.ffn_layer1.linear.w"),
                   "bias": g(f"{X}.ff_layer.ffn_layer1.bias.b")},
            "wo": {"kernel": g(f"{X}.ff_layer.ffn_layer2.linear.w"),
                   "bias": g(f"{X}.ff_layer.ffn_layer2.bias.b")},
        },
        "pre_self_attention_norm_0": {
            "scale": g(f"{X}.layer_norm.scale"),
            "bias": g(f"{X}.layer_norm.bias"),
        },
        "pre_mlp_norm_0": {
            "scale": g(f"{X}.ff_layer.layer_norm.scale"),
            "bias": g(f"{X}.ff_layer.layer_norm.bias"),
        },
    }
    return {"params": {
        "token_embedder": {"embedding": _pad_vocab(
            g(f"{P}.softmax.logits_ffn.linear.w").T, cfg.vocab_size)},
        "position_embedder": {"embedding": _pad_vocab(
            g(f"{P}.position_emb.emb_var"), cfg.max_target_length)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": g(f"{P}.final_ln.scale"),
                         "bias": g(f"{P}.final_ln.bias")},
    }}


def load_paxml_gpt3_checkpoint(path: str, cfg: Config) -> dict:
    """Read a paxml GPT-3 checkpoint (its ``state`` directory) and convert.

    Each paxml variable is a zarr tensorstore in a directory literally named
    ``mdl_vars<dotted name>`` (reference convert_gpt3_ckpt_from_paxml.py:
    228-240 reads the same layout from GCS). Supports local paths and
    gs:// URIs.
    """
    import os as _os

    import tensorstore as ts

    def get(name):
        full = f"mdl_vars{name}"
        if path.startswith("gs://"):
            bucket, prefix = path[len("gs://"):].split("/", 1)
            kv = {"driver": "gcs", "bucket": bucket,
                  "path": _os.path.join(prefix, full)}
        else:
            kv = {"driver": "file", "path": _os.path.join(path, full)}
        spec = {"driver": "zarr", "metadata_key": ".zarray", "kvstore": kv}
        return ts.open(ts.Spec(spec), open=True).result().read().result()

    return convert_paxml_gpt3_to_framework(get, cfg)


def convert_hf_llama4_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF Llama4 text state dict -> framework llama4-family params.

    Scan units of 4 sublayers (3 chunked-rope + 1 NoPE global); MoE per
    sublayer: router -> gate kernel, fused experts gate_up_proj [E, H, 2M]
    split into wi_0/wi_1, down_proj -> wo (direct arrays), shared expert MLP
    (reference: MaxText/llama4_ckpt_unscanned.py; HF modeling_llama4.py:46
    Llama4TextExperts, :147 Llama4TextMoe).
    """
    L = cfg.num_decoder_layers
    E = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    m = cfg.moe_mlp_dim
    P = 4  # sublayers per scan unit
    units = L // P
    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack(sub, fmt, transform):
        return np.stack(
            [transform(get(fmt.format(P * u + sub))) for u in range(units)], axis=0
        )

    layers = {}
    for sub in range(P):
        layers[f"self_attention_{sub}"] = {
            "query": {"kernel": stack(sub, "model.layers.{}.self_attn.q_proj.weight",
                                      lambda w: w.T.reshape(E, nq, hd))},
            "key": {"kernel": stack(sub, "model.layers.{}.self_attn.k_proj.weight",
                                    lambda w: w.T.reshape(E, nkv, hd))},
            "value": {"kernel": stack(sub, "model.layers.{}.self_attn.v_proj.weight",
                                      lambda w: w.T.reshape(E, nkv, hd))},
            "out": {"kernel": stack(sub, "model.layers.{}.self_attn.o_proj.weight",
                                    lambda w: w.T.reshape(nq, hd, E))},
        }
        layers[f"moe_{sub}"] = {
            "gate": {"kernel": stack(sub, "model.layers.{}.feed_forward.router.weight",
                                     lambda w: w.T)},
            "wi_0": stack(sub, "model.layers.{}.feed_forward.experts.gate_up_proj",
                          lambda w: w[:, :, :m]),
            "wi_1": stack(sub, "model.layers.{}.feed_forward.experts.gate_up_proj",
                          lambda w: w[:, :, m:]),
            "wo": stack(sub, "model.layers.{}.feed_forward.experts.down_proj",
                        lambda w: w),
            "shared_experts": {
                "wi_0": {"kernel": stack(
                    sub, "model.layers.{}.feed_forward.shared_expert.gate_proj.weight",
                    lambda w: w.T)},
                "wi_1": {"kernel": stack(
                    sub, "model.layers.{}.feed_forward.shared_expert.up_proj.weight",
                    lambda w: w.T)},
                "wo": {"kernel": stack(
                    sub, "model.layers.{}.feed_forward.shared_expert.down_proj.weight",
                    lambda w: w.T)},
            },
        }
        layers[f"pre_self_attention_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.input_layernorm.weight", lambda w: w)}
        layers[f"pre_mlp_norm_{sub}"] = {
            "scale": stack(sub, "model.layers.{}.post_attention_layernorm.weight",
                           lambda w: w)}

    params = {
        "token_embedder": {"embedding": _pad_vocab(get("model.embed_tokens.weight"), cfg.vocab_size)},
        "decoder": {"layers": layers},
        "decoder_norm": {"scale": get("model.norm.weight")},
    }
    if not cfg.logits_via_embedding:
        params["logits_dense"] = {
            "kernel": _pad_vocab(get("lm_head.weight"), cfg.vocab_size).T.copy()}
    return {"params": params}


def convert_hf_siglip_to_framework(state_dict: dict, num_layers: int) -> dict:
    """HF SiglipVisionModel state dict -> VisionEncoder params.

    The gemma3 vision tower (reference: MaxText gemma3 vision encoder via
    layers/encoders.py VisionEncoder; HF SiglipVisionModel). Fused-qkv
    mapping: flax Dense kernels are [in, out], HF Linear weights [out, in].
    """
    sd = {k.removeprefix("vision_model."): v for k, v in state_dict.items()}

    def get(name):
        return _t(sd[name])

    def lin(name):  # HF Linear -> flax Dense {kernel, bias}
        return {"kernel": get(f"{name}.weight").T.copy(),
                "bias": get(f"{name}.bias")}

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    params = {
        "patch_embed": {
            # Conv2d [E, 3, P, P] -> flax Conv [P, P, 3, E]
            "kernel": get("embeddings.patch_embedding.weight").transpose(2, 3, 1, 0).copy(),
            "bias": get("embeddings.patch_embedding.bias"),
        },
        "pos_embedding": get("embeddings.position_embedding.weight")[None],
        "final_ln": ln("post_layernorm"),
    }
    for i in range(num_layers):
        pre = f"encoder.layers.{i}"
        q, k, v = (lin(f"{pre}.self_attn.{n}_proj") for n in ("q", "k", "v"))
        params[f"block_{i}"] = {
            "ln1": ln(f"{pre}.layer_norm1"),
            "qkv": {
                "kernel": np.concatenate([q["kernel"], k["kernel"], v["kernel"]], axis=1),
                "bias": np.concatenate([q["bias"], k["bias"], v["bias"]]),
            },
            "proj": lin(f"{pre}.self_attn.out_proj"),
            "ln2": ln(f"{pre}.layer_norm2"),
            "fc1": lin(f"{pre}.mlp.fc1"),
            "fc2": lin(f"{pre}.mlp.fc2"),
        }
    return {"params": params}


def convert_hf_gemma3_multimodal(state_dict: dict, cfg: Config, vision_num_layers: int):
    """HF Gemma3ForConditionalGeneration -> (text, vision, projector) params.

    Splits the combined state dict by prefix and reuses the gemma3 text and
    SigLIP tower converters (reference: HF modeling_gemma3.py Gemma3Model =
    vision_tower + multi_modal_projector + language_model)."""
    text_sd = {
        "model." + k.removeprefix("model.language_model."): v
        for k, v in state_dict.items()
        if k.startswith("model.language_model.")
    }
    if "lm_head.weight" in state_dict:
        text_sd["lm_head.weight"] = state_dict["lm_head.weight"]
    vision_sd = {
        k.removeprefix("model.vision_tower.vision_model."): v
        for k, v in state_dict.items()
        if k.startswith("model.vision_tower.")
    }
    text = convert_hf_gemma3_to_framework(text_sd, cfg)
    vision = convert_hf_siglip_to_framework(vision_sd, vision_num_layers)
    projector = {"params": {
        "mm_soft_emb_norm": {
            "scale": _t(state_dict["model.multi_modal_projector.mm_soft_emb_norm.weight"])},
        "mm_input_projection": _t(
            state_dict["model.multi_modal_projector.mm_input_projection_weight"]),
    }}
    return text, vision, projector


def convert_hf_llama4_vision_to_framework(state_dict: dict, num_layers: int) -> dict:
    """HF Llama4VisionModel -> Llama4VisionEncoder params (reference:
    modeling_llama4.py:1004; unfold linear, end-appended CLS, 2D rope
    blocks, pixel-shuffle adapter)."""
    sd = {k.removeprefix("vision_model."): v for k, v in state_dict.items()}

    def get(name):
        return _t(sd[name])

    def lin(name, bias=True):
        out = {"kernel": get(f"{name}.weight").T.copy()}
        if bias:
            out["bias"] = get(f"{name}.bias")
        return out

    def ln(name):
        return {"scale": get(f"{name}.weight"), "bias": get(f"{name}.bias")}

    params = {
        "patch_embed": {"kernel": get("patch_embedding.linear.weight").T.copy()},
        "class_embedding": get("class_embedding"),
        "positional_embedding_vlm": get("positional_embedding_vlm"),
        "layernorm_pre": ln("layernorm_pre"),
        "layernorm_post": ln("layernorm_post"),
        "adapter_fc1": lin("vision_adapter.mlp.fc1", bias=False),
        "adapter_fc2": lin("vision_adapter.mlp.fc2", bias=False),
    }
    for i in range(num_layers):
        pre = f"model.layers.{i}"
        params[f"ln1_{i}"] = ln(f"{pre}.input_layernorm")
        params[f"ln2_{i}"] = ln(f"{pre}.post_attention_layernorm")
        params[f"q_{i}"] = lin(f"{pre}.self_attn.q_proj")
        params[f"k_{i}"] = lin(f"{pre}.self_attn.k_proj")
        params[f"v_{i}"] = lin(f"{pre}.self_attn.v_proj")
        params[f"o_{i}"] = lin(f"{pre}.self_attn.o_proj")
        params[f"fc1_{i}"] = lin(f"{pre}.mlp.fc1")
        params[f"fc2_{i}"] = lin(f"{pre}.mlp.fc2")
    return {"params": params}


def convert_hf_llama4_multimodal(state_dict: dict, cfg: Config, vision_num_layers: int):
    """HF Llama4ForConditionalGeneration -> (text, vision, projector) params."""
    text_sd = {
        k.removeprefix("language_model."): v
        for k, v in state_dict.items()
        if k.startswith("language_model.")
    }
    vision_sd = {
        k.removeprefix("vision_model."): v
        for k, v in state_dict.items()
        if k.startswith("vision_model.")
    }
    text = convert_hf_llama4_to_framework(text_sd, cfg)
    vision = convert_hf_llama4_vision_to_framework(vision_sd, vision_num_layers)
    projector = {"params": {
        "kernel": _t(state_dict["multi_modal_projector.linear_1.weight"]).T.copy()
    }}
    return text, vision, projector


def convert_hf_qwen3_moe_to_framework(state_dict: dict, cfg: Config) -> dict:
    """HF Qwen3MoeForCausalLM -> framework params (qwen3 block + RoutedMoE).

    Per-expert Linear weights stack into the framework's [E, in, out] direct
    arrays; the gate maps to the router kernel; qwen3 per-head q/k norms ride
    the llama converter path (reference: Qwen3MoeSparseMoeBlock; softmax
    routing with norm_topk_prob -> normalize_topk_weights=true)."""
    L = cfg.num_decoder_layers
    n_exp = cfg.num_experts
    sd = state_dict

    def get(name):
        return _t(sd[name])

    def stack_experts(proj, transform):
        return np.stack([
            np.stack([
                transform(get(f"model.layers.{i}.mlp.experts.{e}.{proj}.weight"))
                for e in range(n_exp)
            ], axis=0)
            for i in range(L)
        ], axis=0)  # [L, E, in, out]

    # attention / norms / embeddings via the llama-family mapping (q/k norms
    # included); MoE keys are absent there so build the base without MLP.
    dense_keys = {k: v for k, v in sd.items() if ".mlp." not in k}
    base = convert_hf_llama_to_framework(dense_keys, cfg)
    layers = base["params"]["decoder"]["layers"]
    layers.pop("mlp_0", None)
    layers["moe_0"] = {
        "gate": {"kernel": np.stack(
            [get(f"model.layers.{i}.mlp.gate.weight").T for i in range(L)], axis=0)},
        "wi_0": stack_experts("gate_proj", lambda w: w.T),
        "wi_1": stack_experts("up_proj", lambda w: w.T),
        "wo": stack_experts("down_proj", lambda w: w.T),
    }
    return base
