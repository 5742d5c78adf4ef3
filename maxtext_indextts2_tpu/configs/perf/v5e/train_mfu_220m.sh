#!/bin/bash
# Best measured training-MFU recipe on a single v5e chip (PERF.md):
# 113.5 TF/s (57.7% MFU) — measured on exactly this model (the 220M bench
# config: 12 layers, emb 1024, mlp 4096, 8x128 heads, seq 2048): unrolled
# layers (scan carry stacking cost ~27 ms/step) + bf16 master weights.
# Reference analog: MaxText/configs/v5e/16b.sh etc.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  decoder_block=tts base_emb_dim=1024 base_num_query_heads=8 \
  base_num_kv_heads=8 base_mlp_dim=4096 base_num_decoder_layers=12 \
  head_dim=128 vocab_size=9344 max_target_length=2048 \
  per_device_batch_size=4 remat_policy=minimal attention=flash \
  "flash_block_sizes=[1024,1024]" weight_dtype=bfloat16 scan_layers=false \
  dataset_type=synthetic steps=30 \
  "$@"
