#!/bin/bash
# Checkpoint resharding: train 3 steps on an fsdp=8 mesh, then restore the
# same Orbax checkpoint onto an fsdp=4 x tensor=2 mesh and continue to step
# 6. Orbax reshards at restore; the resumed run must report the restored
# step and keep training (finite, bounded loss).
# Reference: end_to_end/tpu/test_checkpoint_resharding.sh.
set -e
cd "$(dirname "$0")/.."
export MTT_PLATFORM=${MTT_PLATFORM:-cpu}
export XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}"
OUTDIR=$(mktemp -d /tmp/e2e_reshard_XXXX)
METRICS="$OUTDIR/resume.jsonl"
CFG=(base_emb_dim=128 base_mlp_dim=256 base_num_decoder_layers=2
     base_num_query_heads=4 base_num_kv_heads=4 head_dim=32 vocab_size=256
     max_target_length=64 per_device_batch_size=1 dtype=float32
     enable_checkpointing=true checkpoint_period=1
     base_output_directory="$OUTDIR" run_name=reshard)

python -m maxtext_indextts2_tpu.train.train \
  "${CFG[@]}" ici_fsdp_parallelism=8 steps=3

LOG=$(python -m maxtext_indextts2_tpu.train.train \
  "${CFG[@]}" ici_fsdp_parallelism=4 ici_tensor_parallelism=2 steps=6 \
  metrics_file="$METRICS" 2>&1)
# the resumed run must start at the restored step (3), not from scratch
echo "$LOG" | grep -q "^step 3:" \
  || { echo "FAIL: resumed run did not start at step 3"; echo "$LOG" | tail -20; exit 1; }
echo "$LOG" | grep -q "^step 0:" \
  && { echo "FAIL: resumed run re-ran step 0"; exit 1; }
python tools/eval_assert.py "$METRICS" loss last lt 30
rm -rf "$OUTDIR"
echo "checkpoint resharding e2e PASSED"
