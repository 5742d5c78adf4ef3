"""TFLOPs accounting (reference: MaxText/maxtext_utils.py:475
calculate_tflops_training_per_device). Causal attention counted at half
FLOPs, matching the reference's MFU methodology (README.md:34)."""

from __future__ import annotations

from maxtext_indextts2_tpu.config import Config

# Peak bf16 TFLOP/s per chip.
PEAK_TFLOPS = {
    "v4": 275.0,
    "v5e": 197.0,
    "v5p": 459.0,
    "v6e": 918.0,
    "cpu": 1.0,
}


def per_token_matmul_flops(cfg: Config) -> float:
    """Forward matmul FLOPs per token (2*m*n*k accounting)."""
    d = cfg.emb_dim
    nq, nkv, hd = cfg.num_query_heads, cfg.num_kv_heads, cfg.head_dim
    qkvo = 2 * d * hd * (2 * nq + 2 * nkv)
    if cfg.num_experts > 1:
        active = cfg.num_experts_per_tok + cfg.shared_experts
        mlp = 2 * 3 * d * cfg.moe_mlp_dim * active
        dense_frac = cfg.first_num_dense_layers / max(cfg.num_decoder_layers, 1)
        mlp = mlp * (1 - dense_frac) + 2 * 3 * d * cfg.mlp_dim * dense_frac
    else:
        n_act = len(cfg.mlp_activations) + 1  # wi_0, wi_1, wo
        mlp = 2 * n_act * d * cfg.mlp_dim
    per_layer = qkvo + mlp
    embed = 2 * d * cfg.vocab_size  # unembedding
    return per_layer * cfg.num_decoder_layers + embed


def attention_flops_per_token(cfg: Config, seq_len: int, causal: bool = True) -> float:
    """Attention score+value FLOPs per token; causal halves the window."""
    window = seq_len / 2 if causal else seq_len
    if cfg.sliding_window_size > 0:
        window = min(window, cfg.sliding_window_size)
    return 2 * 2 * cfg.num_query_heads * cfg.head_dim * window * cfg.num_decoder_layers


def training_tflops_per_step(cfg: Config, seq_len: int | None = None) -> float:
    """Total (fwd+bwd = 3x fwd) TFLOPs per train step across all devices."""
    seq = seq_len or cfg.max_target_length
    tokens = cfg.global_batch_size_to_train_on * seq
    fwd = tokens * (per_token_matmul_flops(cfg) + attention_flops_per_token(cfg, seq))
    return 3 * fwd / 1e12


def mfu(tflops_per_step: float, step_time_s: float, num_chips: int, chip: str = "v5e") -> float:
    peak = PEAK_TFLOPS.get(chip, 197.0)
    return tflops_per_step / step_time_s / (num_chips * peak)


def main(argv=None):
    """CLI: print per-device training TFLOPs for a config
    (reference: MaxText/get_flops.py).

    python -m maxtext_indextts2_tpu.utils.flops model_name=llama2-7b
    """
    import sys

    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config(list(sys.argv[1:] if argv is None else argv))
    total = training_tflops_per_step(cfg)
    per_device = total / max(cfg.num_devices, 1)
    print(f"Total TFLOPs per device per step: {per_device:.3f} "
          f"(global {total:.3f} over {cfg.num_devices} devices)")


if __name__ == "__main__":
    main()
