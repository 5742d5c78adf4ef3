#!/bin/bash
# Best measured training-MFU recipe on a single v5e chip (PERF.md):
# 113.5 TF/s (57.7% MFU) on the 220M bench model — unrolled layers
# (scan carry stacking cost ~27 ms/step) + bf16 master weights.
# Reference analog: MaxText/configs/v5e/16b.sh etc.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  per_device_batch_size=4 remat_policy=minimal attention=flash \
  "flash_block_sizes=[1024,1024]" weight_dtype=bfloat16 scan_layers=false \
  dataset_type=synthetic steps=30 \
  "$@"
