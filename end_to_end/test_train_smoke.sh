#!/bin/bash
# 10-step tiny-model smoke on synthetic data; asserts the loss moved.
# Reference: end_to_end/tpu/train_smoke_test + eval_assert.
set -e
cd "$(dirname "$0")/.."
METRICS=$(mktemp /tmp/e2e_smoke_XXXX.jsonl)
python -m maxtext_indextts2_tpu.train.train \
  base_emb_dim=128 base_mlp_dim=256 base_num_decoder_layers=2 \
  base_num_query_heads=4 base_num_kv_heads=4 head_dim=32 vocab_size=256 \
  max_target_length=128 per_device_batch_size=1 steps=10 \
  dataset_type=synthetic metrics_file="$METRICS"
python tools/eval_assert.py "$METRICS" loss final_lt_initial
