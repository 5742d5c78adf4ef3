#!/bin/bash
# GRPO CLI smoke: runs the demo reward (prefer long non-pad completions)
# through inline generation + group-relative advantage updates; asserts the
# final metrics are finite.
# Reference: end_to_end/tpu/test_grpo.sh.
set -e
cd "$(dirname "$0")/.."
OUT=$(MTT_PLATFORM=${MTT_PLATFORM:-cpu} python -m maxtext_indextts2_tpu.train.grpo \
  base_emb_dim=64 base_mlp_dim=128 base_num_decoder_layers=2 \
  base_num_query_heads=2 base_num_kv_heads=2 head_dim=32 vocab_size=256 \
  max_target_length=64 max_prefill_predict_length=16 \
  per_device_batch_size=2 dtype=float32 steps=2 \
  decode_sampling_strategy=weighted decode_sampling_temperature=1.0 \
  warmup_steps_fraction=0 learning_rate=1e-4 | tail -1)
echo "$OUT"
python - "$OUT" <<'EOF'
import ast, math, sys
metrics = ast.literal_eval(sys.argv[1])
assert math.isfinite(metrics["loss"]), metrics
assert math.isfinite(metrics["kl"]), metrics
print("grpo e2e PASSED")
EOF
