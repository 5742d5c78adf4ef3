#!/bin/bash
# DPO CLI smoke: synthetic paired preference batches; asserts the final
# loss fell below -log sigmoid(0) = log 2 (pi == ref at init) and that the
# chosen reward beats the rejected one.
# Reference: end_to_end/tpu/test_dpo.sh.
set -e
cd "$(dirname "$0")/.."
OUT=$(MTT_PLATFORM=${MTT_PLATFORM:-cpu} python -m maxtext_indextts2_tpu.train.dpo \
  base_emb_dim=64 base_mlp_dim=128 base_num_decoder_layers=2 \
  base_num_query_heads=2 base_num_kv_heads=2 head_dim=32 vocab_size=256 \
  max_target_length=64 per_device_batch_size=4 dtype=float32 steps=6 \
  warmup_steps_fraction=0 learning_rate=1e-3 | tail -1)
echo "$OUT"
python - "$OUT" <<'EOF'
import math, re, sys
kv = dict(re.findall(r"(\w+)=([-\d.]+)", sys.argv[1]))
loss = float(kv["loss"])
assert math.isfinite(loss) and loss < math.log(2.0), f"dpo loss {loss} did not improve"
assert float(kv["chosen_reward"]) > float(kv["rejected_reward"]), kv
print("dpo e2e PASSED")
EOF
