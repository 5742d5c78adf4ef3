#!/bin/bash
# Best measured 1B-class training recipe on v5e (PERF.md "1B training MFU"):
# bf16 111.0 TF/s/chip (56.4% MFU); add quantization=int8 for 115.1 (58.4%).
# Unrolled layers + save_attn_and_mlp selective remat + bf16 masters.
# Reference analog: MaxText/configs/v5e/16b.sh.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  dataset_type=synthetic \
  per_device_batch_size=4 remat_policy=save_attn_and_mlp attention=flash \
  "flash_block_sizes=[1024,1024]" weight_dtype=bfloat16 scan_layers=false \
  cast_logits_to_fp32=false steps=30 \
  "$@"
