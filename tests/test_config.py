"""Config system tests (mirrors reference MaxText/tests/pyconfig_test.py)."""

import os

import pytest

from maxtext_indextts2_tpu.config import Config, finalize, load_config


PKG_CONFIGS = os.path.join(
    os.path.dirname(__file__), "..", "maxtext_indextts2_tpu", "configs"
)


def test_defaults_finalize():
    cfg = load_config([])
    assert cfg.num_devices == 8
    assert cfg.emb_dim == 2048
    assert cfg.global_batch_size_to_train_on == 8


def test_yaml_and_overrides():
    cfg = load_config(
        [os.path.join(PKG_CONFIGS, "tiny.yml"), "steps=42", "learning_rate=1e-4"]
    )
    assert cfg.model_name == "tiny"
    assert cfg.base_emb_dim == 256
    assert cfg.steps == 42
    assert cfg.learning_rate == pytest.approx(1e-4)


def test_yaml_inheritance():
    cfg = load_config([os.path.join(PKG_CONFIGS, "tiny_tts.yml")])
    assert cfg.base_emb_dim == 256  # inherited from tiny.yml
    assert cfg.vocab_size == 9344  # overridden


def test_bool_and_tuple_coercion():
    cfg = load_config(["scan_layers=false", "mlp_activations=[gelu,linear]"])
    assert cfg.scan_layers is False
    assert cfg.mlp_activations == ("gelu", "linear")


def test_unknown_key_rejected():
    with pytest.raises(ValueError, match="unknown config key"):
        load_config(["not_a_real_key=1"])


def test_parallelism_fill():
    cfg = load_config(["ici_tensor_parallelism=2"])  # fsdp defaults to -1
    assert cfg.ici_fsdp_parallelism == 4
    assert cfg.ici_tensor_parallelism == 2


def test_parallelism_product_mismatch():
    with pytest.raises(ValueError, match="does not divide|!="):
        load_config(["ici_fsdp_parallelism=3", "ici_tensor_parallelism=2"])


def test_batch_size_math():
    cfg = load_config(["per_device_batch_size=2"])
    assert cfg.global_batch_size_to_train_on == 16
    cfg = load_config(["per_device_batch_size=0.5"])
    assert cfg.global_batch_size_to_train_on == 4
    assert cfg.global_batch_size_to_load == 8


def test_grad_accumulation_scales_batch():
    cfg = load_config(["per_device_batch_size=1", "gradient_accumulation_steps=4"])
    assert cfg.global_batch_size_to_train_on == 32
    assert cfg.micro_batch_size_to_train_on == 8


def test_global_parameter_scale():
    cfg = load_config(["global_parameter_scale=8"])
    assert cfg.emb_dim == 4096  # 2048 * 2
    assert cfg.num_decoder_layers == 32


def test_env_override(monkeypatch):
    monkeypatch.setenv("MTT_STEPS", "77")
    cfg = load_config([])
    assert cfg.steps == 77


def test_env_non_config_knobs_ignored(monkeypatch):
    # The MTT_ namespace also carries tool knobs read at their use sites
    # (MTT_FUSED_ADALN, MTT_BENCH_S2A, ...) — load_config must not treat
    # them as (unknown) config overrides. CLI typos still raise.
    monkeypatch.setenv("MTT_FUSED_ADALN", "0")
    monkeypatch.setenv("MTT_BENCH_S2A", "int8")
    cfg = load_config([])
    assert cfg.steps  # loaded fine
    with pytest.raises(ValueError, match="unknown config key"):
        load_config(["not_a_real_key=1"])


def test_pipeline_derived():
    cfg = load_config(
        ["ici_stage_parallelism=4", "ici_fsdp_parallelism=2", "base_num_decoder_layers=16"]
    )
    assert cfg.using_pipeline_parallelism
    assert cfg.num_pipeline_repeats == 4
    assert cfg.num_pipeline_microbatches == 4


def test_shardy_toggle():
    """cfg.shardy flips jax_use_shardy_partitioner (reference: base.yml:712 +
    train.py:724); '' leaves the JAX default untouched."""
    import jax

    from maxtext_indextts2_tpu.config import load_config

    default = jax.config.jax_use_shardy_partitioner
    try:
        load_config(["shardy=false"])
        assert jax.config.jax_use_shardy_partitioner is False
        load_config(["shardy=true"])
        assert jax.config.jax_use_shardy_partitioner is True
    finally:
        jax.config.update("jax_use_shardy_partitioner", default)
