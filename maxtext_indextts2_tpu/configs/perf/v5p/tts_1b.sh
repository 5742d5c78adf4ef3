#!/bin/bash
# tts-1b training launch tuned for v5p hosts (95 GB HBM, 459 TF/s bf16):
# 2x the v5e batch at the same selective-remat recipe. Per-chip batch and
# remat should be re-swept on real v5p hardware (benchmarks/mfu_1b.py).
# Reference analog: MaxText/configs/v5p/*.sh.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  dataset_type=synthetic \
  per_device_batch_size=8 remat_policy=save_attn_and_mlp attention=flash \
  "flash_block_sizes=[1024,1024]" weight_dtype=bfloat16 scan_layers=false \
  cast_logits_to_fp32=false steps=30 \
  "$@"
