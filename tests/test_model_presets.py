"""Every model preset must load and finalize (reference: per-model yml configs)."""

import glob
import os

import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config

PRESET_DIR = os.path.join(
    os.path.dirname(__file__), "..", "maxtext_indextts2_tpu", "configs", "models"
)
PRESETS = sorted(
    os.path.splitext(os.path.basename(p))[0] for p in glob.glob(f"{PRESET_DIR}/*.yml")
)


@pytest.mark.parametrize("name", PRESETS)
def test_preset_loads(name):
    cfg = load_config([f"model_name={name}"])
    # gpt3-52k is a deliberately tiny smoke-test preset (reference has one)
    assert cfg.emb_dim >= (16 if name == "gpt3-52k" else 128)
    assert cfg.num_decoder_layers >= 1
    assert cfg.num_query_heads % cfg.num_kv_heads == 0


def test_preset_cli_override_wins():
    cfg = load_config(["model_name=llama2-7b", "base_num_decoder_layers=2"])
    assert cfg.base_emb_dim == 4096  # from preset
    assert cfg.base_num_decoder_layers == 2  # CLI wins


def test_gpt3_positional_embedding_trains():
    from maxtext_indextts2_tpu.train.train import train_loop

    cfg = load_config([
        "decoder_block=gpt3", "use_positional_embedding=true", "rope_type=none",
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=256", "max_target_length=64", "steps=2", "dtype=float32",
    ])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
