#!/bin/bash
# Tuned zero-shot TTS serving launch (v5e, 1 chip == 1 shard of a v5e-8 pod).
# Measured on-chip (PERF.md): 128 decode slots -> 235.8 LM streams/chip
# (cross-slot-pipelined ragged v2, 128-wide KV blocks); S2A bf16 33.6
# streams/chip -> effective RTF/stream 0.0342, ~269 streams on v5e-8.
# Add s2a_serving_dtype=int8_offline for the int8+bf16-residual S2A combo
# (39.9 streams/chip, RTF 0.0295) at a small unscored quality tradeoff.
# Reference analog: MaxText/configs/v5e/*.sh tuned launch scripts.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.infer.server \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  per_device_batch_size=128 decode_attention=ragged serve_unroll_layers=true \
  serve_params_dtype=bfloat16 s2a_serving_dtype=bfloat16 \
  max_target_length=2048 \
  "$@"
