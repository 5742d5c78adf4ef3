#!/bin/bash
# llama2-70b pretraining on a v5p-128+ slice: FSDP across the slice,
# attention-output remat saves (weights dominate HBM at 70B; activations
# must stay lean). Reference analog: MaxText/configs/v5p/llama2_70b.sh.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/llama2-70b.yml \
  ici_fsdp_parallelism=-1 per_device_batch_size=4 \
  remat_policy=save_attn_out attention=flash weight_dtype=bfloat16 \
  "$@"
