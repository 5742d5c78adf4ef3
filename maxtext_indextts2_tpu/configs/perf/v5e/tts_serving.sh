#!/bin/bash
# Tuned zero-shot TTS serving launch (v5e, 1 chip == 1 shard of a v5e-8 pod).
# Measured on-chip (PERF.md): 96 decode slots -> 150.7 LM streams/chip,
# effective RTF/stream ~0.052, ~136 concurrent streams on v5e-8.
# Reference analog: MaxText/configs/v5e/*.sh tuned launch scripts.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.infer.server \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  per_device_batch_size=96 decode_attention=ragged serve_unroll_layers=true \
  serve_params_dtype=bfloat16 max_target_length=2048 \
  "$@"
