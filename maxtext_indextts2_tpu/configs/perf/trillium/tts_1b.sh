#!/bin/bash
# tts-1b training launch tuned for trillium/v6e (32 GB HBM, 918 TF/s bf16):
# larger batch; re-sweep remat/batch on real v6e (benchmarks/mfu_1b.py).
# Reference analog: MaxText/configs/trillium/*.sh.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  dataset_type=synthetic \
  per_device_batch_size=8 remat_policy=save_attn_and_mlp attention=flash \
  "flash_block_sizes=[1024,1024]" weight_dtype=bfloat16 scan_layers=false \
  cast_logits_to_fp32=false steps=30 \
  "$@"
