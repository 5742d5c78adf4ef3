#!/bin/bash
# SFT CLI smoke: tiny model, synthetic prompt/completion pairs with
# prompt-masked loss; asserts the loss moved.
# Reference: end_to_end/tpu/test_sft_trainer.sh.
set -e
cd "$(dirname "$0")/.."
METRICS=$(mktemp /tmp/e2e_sft_XXXX.jsonl)
MTT_PLATFORM=${MTT_PLATFORM:-cpu} python -m maxtext_indextts2_tpu.train.sft \
  base_emb_dim=128 base_mlp_dim=256 base_num_decoder_layers=2 \
  base_num_query_heads=4 base_num_kv_heads=4 head_dim=32 vocab_size=256 \
  max_target_length=64 per_device_batch_size=1 steps=10 \
  warmup_steps_fraction=0 learning_rate=1e-3 metrics_file="$METRICS"
python tools/eval_assert.py "$METRICS" loss final_lt_initial
echo "sft e2e PASSED"
