"""Convert an HF checkpoint with block-quantized FP8 weights to BF16.

Counterpart of reference MaxText/deepseek_fp8_to_bf16.py (weight_dequant_cpu:39,
convert_fp8_to_bf16:74): DeepSeek-V3-style HF checkpoints store
float8_e4m3fn `*.weight` tensors with a companion `*.weight_scale_inv` of
per-[128, 128]-block scales. This tool rewrites the safetensors shards with
dequantized bf16 weights so the regular HF->framework converter
(utils/ckpt_conversion.py) can load them.

IO goes through safetensors' torch backend (torch-cpu, like the reference
tool — the numpy backend cannot serialize fp8); the dequant math is numpy.

Usage:
  python tools/fp8_dequant_checkpoint.py --input <fp8_hf_dir> --output <bf16_hf_dir>
"""

from __future__ import annotations

import argparse
import json
import os
from glob import glob

import numpy as np


def weight_dequant(x: np.ndarray, s: np.ndarray, block_size: int = 128) -> np.ndarray:
    """Dequantize a [M, N] f32 tensor with [ceil(M/b), ceil(N/b)] block scales.

    Matches reference weight_dequant_cpu (deepseek_fp8_to_bf16.py:39): each
    [128, 128] block is multiplied by its scale; edge blocks are partial.
    Input must already be upcast to f32; returns f32 (caller casts to bf16).
    """
    assert x.ndim == 2 and s.ndim == 2, "x and s must be 2D"
    m, n = x.shape
    # expand block scales to element resolution, then crop the edge
    se = np.repeat(np.repeat(s.astype(np.float32), block_size, 0), block_size, 1)
    return x.astype(np.float32) * se[:m, :n]


def convert_fp8_to_bf16(input_dir: str, output_dir: str) -> int:
    """Rewrites every shard; returns the number of dequantized tensors."""
    import torch
    from safetensors.torch import load_file, save_file

    os.makedirs(output_dir, exist_ok=True)
    shards = sorted(glob(os.path.join(input_dir, "*.safetensors")))
    if not shards:
        raise FileNotFoundError(f"no .safetensors in {input_dir}")

    # scales may live in a different shard than their weight: index them
    index_path = os.path.join(input_dir, "model.safetensors.index.json")
    weight_map = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            weight_map = json.load(f).get("weight_map", {})

    def load_scale(name: str, current: dict):
        if name in current:
            return current[name]
        shard = weight_map.get(name)
        if shard is None:
            raise KeyError(f"missing scale tensor {name}")
        return load_file(os.path.join(input_dir, shard))[name]

    n_converted = 0
    new_map = {}
    for shard_path in shards:
        tensors = load_file(shard_path)
        out = {}
        for name, arr in tensors.items():
            if name.endswith("_scale_inv"):
                continue  # consumed with its weight
            if arr.dtype == torch.float8_e4m3fn:
                scale = load_scale(name + "_scale_inv", tensors)
                deq = weight_dequant(
                    arr.to(torch.float32).numpy(), scale.to(torch.float32).numpy()
                )
                out[name] = torch.from_numpy(deq).to(torch.bfloat16)
                n_converted += 1
            else:
                out[name] = arr
        base = os.path.basename(shard_path)
        save_file(out, os.path.join(output_dir, base))
        for name in out:
            new_map[name] = base

    if weight_map:
        with open(os.path.join(output_dir, "model.safetensors.index.json"), "w") as f:
            json.dump({"metadata": {}, "weight_map": new_map}, f)
    # config/tokenizer files pass through
    for aux in glob(os.path.join(input_dir, "*.json")) + glob(
        os.path.join(input_dir, "*.model")
    ):
        base = os.path.basename(aux)
        if base == "model.safetensors.index.json":
            continue
        with open(aux, "rb") as src, open(os.path.join(output_dir, base), "wb") as dst:
            dst.write(src.read())
    return n_converted


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="fp8 HF checkpoint dir")
    ap.add_argument("--output", required=True, help="bf16 output dir")
    args = ap.parse_args()
    n = convert_fp8_to_bf16(args.input, args.output)
    print(f"dequantized {n} fp8 tensors -> {args.output}")


if __name__ == "__main__":
    main()
