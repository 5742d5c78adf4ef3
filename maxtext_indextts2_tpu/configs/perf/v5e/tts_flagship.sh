#!/bin/bash
# Best measured FLAGSHIP-vocab (264,192 rows, tied embedding, 1.78B params)
# training recipe on v5e (PERF.md "Flagship-vocab ... MFU"): chunked fused
# vocab CE 512 + int8 AQT = 106.95 TF/s/chip (54.3% MFU); drop
# quantization=int8 for bf16 (101.8, 51.7%). The fused CE is what makes
# batch>1 exist at all at this vocab on a 16 GB chip (full f32 logits at
# b4/s2048 would be 8.6 GB).
# Reference analog: the fork's expanded-vocab regime
# (vocab_expansion/expand_embedder.py) on MaxText/configs/v5e/*.sh tuning.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/tts-flagship.yml \
  dataset_type=synthetic \
  per_device_batch_size=4 fused_vocab_ce_chunk=512 quantization=int8 \
  remat_policy=full attention=flash "flash_block_sizes=[1024,1024]" \
  weight_dtype=bfloat16 scan_layers=false cast_logits_to_fp32=false \
  steps=30 \
  "$@"
