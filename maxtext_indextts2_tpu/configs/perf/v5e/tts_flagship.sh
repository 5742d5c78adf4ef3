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
# NOTE: the measured single-chip regime is the tts-1b BODY with the
# expanded 264k tied vocab (benchmarks/mfu_flagship.py MODEL_FLAGSHIP_VOCAB)
# — configs/models/tts-flagship.yml is the 12B-class multi-chip model
# (AOT-verified for v5e-256, PERF.md "Flagship (12B-class) AOT").
python -m maxtext_indextts2_tpu.train.train \
  dataset_type=synthetic decoder_block=tts \
  base_emb_dim=2048 base_num_query_heads=16 base_num_kv_heads=8 \
  base_mlp_dim=8192 base_num_decoder_layers=20 head_dim=128 \
  vocab_size=264192 logits_via_embedding=true max_target_length=2048 \
  per_device_batch_size=4 fused_vocab_ce_chunk=512 quantization=int8 \
  remat_policy=full attention=flash "flash_block_sizes=[1024,1024]" \
  weight_dtype=bfloat16 scan_layers=false cast_logits_to_fp32=false \
  steps=30 \
  "$@"
