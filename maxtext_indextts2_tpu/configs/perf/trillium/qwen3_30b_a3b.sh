#!/bin/bash
# qwen3-30b-a3b (MoE, 128 experts top-8) on a trillium slice: FSDP weights,
# experts via lax.ragged_dot (measured 63% of the weight-streaming roofline
# at these shapes — benchmarks/moe_gmm.py decision record).
# Reference analog: MaxText/configs/trillium/*.sh.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/qwen3-30b-a3b.yml \
  ici_fsdp_parallelism=-1 per_device_batch_size=4 remat_policy=full \
  attention=flash weight_dtype=bfloat16 \
  "$@"
