#!/bin/bash
# llama2-7b training launch for a v5e-8 host (8 chips): pure FSDP with the
# flags that measured best on this hardware generation (flash attention with
# 1024 blocks, minimal remat, bf16 weights). Multi-host: wrap with
# tools/multihost_runner.py. Reference analog: MaxText/configs/v5e/llama2_7b.sh.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.train.train \
  maxtext_indextts2_tpu/configs/models/llama2-7b.yml \
  ici_fsdp_parallelism=8 per_device_batch_size=4 remat_policy=minimal \
  attention=flash "flash_block_sizes=[1024,1024]" weight_dtype=bfloat16 \
  "$@"
