"""fp8->bf16 HF checkpoint conversion (reference: deepseek_fp8_to_bf16.py)."""

import json
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
pytest.importorskip("safetensors.torch")

from tools.fp8_dequant_checkpoint import convert_fp8_to_bf16, weight_dequant


def test_weight_dequant_blockwise():
    rng = np.random.default_rng(0)
    m, n, b = 300, 200, 128  # partial edge blocks
    w = rng.standard_normal((m, n)).astype(np.float32)
    s = rng.uniform(0.5, 2.0, (3, 2)).astype(np.float32)
    y = weight_dequant(w, s, b)
    # block (1, 1): rows 128:256, cols 128:200
    np.testing.assert_allclose(y[130, 150], w[130, 150] * s[1, 1], rtol=1e-6)
    # edge block (2, 0): rows 256:300, cols 0:128
    np.testing.assert_allclose(y[299, 5], w[299, 5] * s[2, 0], rtol=1e-6)


def test_convert_roundtrip(tmp_path):
    from safetensors.torch import load_file, save_file

    src = tmp_path / "fp8"
    dst = tmp_path / "bf16"
    os.makedirs(src)
    g = torch.Generator().manual_seed(1)
    w = torch.randn(256, 128, generator=g).to(torch.float8_e4m3fn)
    s = torch.full((2, 1), 2.0, dtype=torch.float32)
    other = torch.randn(4, 4, generator=g)
    save_file(
        {"layer.weight": w, "layer.weight_scale_inv": s, "norm.weight": other},
        str(src / "model-00001-of-00001.safetensors"),
    )
    with open(src / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": {
            "layer.weight": "model-00001-of-00001.safetensors",
            "layer.weight_scale_inv": "model-00001-of-00001.safetensors",
            "norm.weight": "model-00001-of-00001.safetensors",
        }}, f)
    with open(src / "config.json", "w") as f:
        json.dump({"model_type": "test"}, f)

    n = convert_fp8_to_bf16(str(src), str(dst))
    assert n == 1
    out = load_file(str(dst / "model-00001-of-00001.safetensors"))
    assert "layer.weight_scale_inv" not in out
    assert out["layer.weight"].dtype == torch.bfloat16
    np.testing.assert_allclose(
        out["layer.weight"].to(torch.float32).numpy(),
        w.to(torch.float32).numpy() * 2.0, rtol=1e-2, atol=1e-2,
    )
    np.testing.assert_array_equal(
        out["norm.weight"].numpy(), other.numpy()
    )
    assert (dst / "config.json").exists()
    with open(dst / "model.safetensors.index.json") as f:
        assert "layer.weight" in json.load(f)["weight_map"]
