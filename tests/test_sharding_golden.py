"""Golden-sharding regression (reference: sharding_compare_test.py +
tests/sharding_info/). Catches silent sharding regressions on the flagship
layout: fsdp4 x tensor2 over the CPU test mesh."""

import json
import os

import jax
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import create_device_mesh
from maxtext_indextts2_tpu.train.train import setup_train_state
from maxtext_indextts2_tpu.utils.debug import (
    diff_shardings_vs_golden,
    save_sharding_golden,
)

GOLDEN = os.path.join(os.path.dirname(__file__), "sharding_info",
                      "tts_fsdp4_tp2.json")
CFG = [
    "decoder_block=tts", "base_emb_dim=256", "base_mlp_dim=512",
    "base_num_decoder_layers=2", "base_num_query_heads=4",
    "base_num_kv_heads=4", "head_dim=64", "vocab_size=9344",
    "max_target_length=128", "ici_fsdp_parallelism=4",
    "ici_tensor_parallelism=2", "scan_layers=true",
]


def test_sharding_matches_golden():
    cfg = load_config(CFG)
    mesh = create_device_mesh(cfg)
    state, _ = setup_train_state(cfg, Transformer(cfg=cfg, mesh=mesh), mesh,
                                 jax.random.PRNGKey(0))
    if not os.path.exists(GOLDEN):
        save_sharding_golden(state.params, GOLDEN)
        pytest.skip("golden created; commit tests/sharding_info/")
    diffs = diff_shardings_vs_golden(state.params, GOLDEN)
    assert diffs == [], "sharding regression:\n" + "\n".join(diffs)


EP_GOLDEN = os.path.join(os.path.dirname(__file__), "sharding_info",
                         "moe_ep4_tp2.json")
EP_CFG = [
    "decoder_block=mixtral", "base_emb_dim=256", "base_mlp_dim=512",
    "moe_mlp_dim=512", "base_num_decoder_layers=2",
    "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=64",
    "vocab_size=1024", "max_target_length=128", "num_experts=8",
    "num_experts_per_tok=2", "ici_expert_parallelism=4",
    "ici_tensor_parallelism=2", "scan_layers=true",
]


def test_ep_sharding_matches_golden():
    """Expert-parallel golden: regressions in expert-axis sharding (e.g. a
    dropped 'expert' rule) must fail this diff, not silently replicate."""
    cfg = load_config(EP_CFG)
    mesh = create_device_mesh(cfg)
    state, _ = setup_train_state(cfg, Transformer(cfg=cfg, mesh=mesh), mesh,
                                 jax.random.PRNGKey(0))
    if not os.path.exists(EP_GOLDEN):
        save_sharding_golden(state.params, EP_GOLDEN)
        pytest.skip("golden created; commit tests/sharding_info/")
    diffs = diff_shardings_vs_golden(state.params, EP_GOLDEN)
    assert diffs == [], "EP sharding regression:\n" + "\n".join(diffs)


PP_GOLDEN = os.path.join(os.path.dirname(__file__), "sharding_info",
                         "tts_pp2_fsdp2_tp2.json")
PP_CFG = [
    "decoder_block=tts", "base_emb_dim=256", "base_mlp_dim=512",
    "base_num_decoder_layers=4", "base_num_query_heads=4",
    "base_num_kv_heads=4", "head_dim=64", "vocab_size=9344",
    "max_target_length=128", "ici_stage_parallelism=2",
    "ici_fsdp_parallelism=2", "ici_tensor_parallelism=2",
    "num_pipeline_repeats=2", "scan_layers=true",
]


def test_pp_sharding_matches_golden():
    """Pipeline-parallel golden: stage-stacked params must stay sharded over
    the 'stage' axis."""
    cfg = load_config(PP_CFG)
    mesh = create_device_mesh(cfg)
    state, _ = setup_train_state(cfg, Transformer(cfg=cfg, mesh=mesh), mesh,
                                 jax.random.PRNGKey(0))
    if not os.path.exists(PP_GOLDEN):
        save_sharding_golden(state.params, PP_GOLDEN)
        pytest.skip("golden created; commit tests/sharding_info/")
    diffs = diff_shardings_vs_golden(state.params, PP_GOLDEN)
    assert diffs == [], "PP sharding regression:\n" + "\n".join(diffs)
