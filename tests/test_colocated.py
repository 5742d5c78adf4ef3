"""Controller-offloaded data loading + single-controller init gating.

Reference: MaxText/multihost_dataloading.py:125-216 (colocated-python
RemoteIterator, base.yml:492 colocated_python_data_input) and
MaxText/train.py:713 (pathwaysutils.initialize)."""

import json

import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.parallel import (
    maybe_initialize_single_controller,
    running_under_proxy_backend,
)
from maxtext_indextts2_tpu.train.train import create_data_iterator


def test_colocated_synthetic_round_trip():
    cfg = load_config([
        "dataset_type=synthetic", "colocated_python_data_input=true",
        "per_device_batch_size=0.25", "max_target_length=32",
    ])
    it = create_data_iterator(cfg)
    from maxtext_indextts2_tpu.train.data.colocated import ColocatedDataIterator

    assert isinstance(it, ColocatedDataIterator)
    try:
        b1 = next(it)
        b2 = next(it)
        assert b1["inputs"].shape == (cfg.global_batch_size_to_load, 32)
        assert isinstance(b1["inputs"], np.ndarray)
        np.testing.assert_array_equal(b1["inputs"], b2["inputs"])  # synthetic repeats
    finally:
        it.close()


def test_colocated_grain_state_resume(tmp_path):
    """get_state/set_state reproduce the exact post-restore stream, matching
    the in-process grain pipeline's checkpoint protocol."""
    shard = tmp_path / "data.jsonl"
    with open(shard, "w") as f:
        for i in range(64):
            f.write(json.dumps({"text": f"colocated example {i} " * 3}) + "\n")
    argv = [
        "dataset_type=grain", f"dataset_path={shard}",
        "colocated_python_data_input=true",
        "per_device_batch_size=0.25", "max_target_length=64", "num_epochs=8",
    ]
    it = create_data_iterator(load_config(argv))
    try:
        for _ in range(3):
            next(it)
        state = it.get_state()
        expected = [next(it) for _ in range(2)]
    finally:
        it.close()

    it2 = create_data_iterator(load_config(argv))
    try:
        it2.set_state(state)
        got = [next(it2) for _ in range(2)]
    finally:
        it2.close()
    for e, g in zip(expected, got):
        for k in e:
            np.testing.assert_array_equal(e[k], g[k])


def test_single_controller_success_path(monkeypatch):
    """With pathwaysutils present (stubbed — mock pattern: reference
    tests/elastic_train_test.py:59-93), the gate must actually call
    pathwaysutils.initialize() and report True."""
    import sys
    import types

    calls = []
    stub = types.ModuleType("pathwaysutils")
    stub.initialize = lambda: calls.append("initialize")
    monkeypatch.setitem(sys.modules, "pathwaysutils", stub)
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)

    cfg = load_config(["enable_single_controller=true"])
    assert maybe_initialize_single_controller(cfg) is True
    assert calls == ["initialize"]

    # env-var route (JAX_PLATFORMS=proxy) initializes too, without a cfg
    monkeypatch.setenv("JAX_PLATFORMS", "proxy")
    assert maybe_initialize_single_controller(None) is True
    assert calls == ["initialize", "initialize"]


def test_single_controller_gating(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    cfg = load_config([])
    assert maybe_initialize_single_controller(cfg) is False  # default: no-op
    assert not running_under_proxy_backend()

    cfg = load_config(["enable_single_controller=true"])
    with pytest.raises(ImportError, match="pathwaysutils"):
        maybe_initialize_single_controller(cfg)  # lib absent in this image

    monkeypatch.setenv("JAX_PLATFORMS", "proxy")
    assert running_under_proxy_backend()
    with pytest.raises(ImportError, match="pathwaysutils"):
        maybe_initialize_single_controller(None)
