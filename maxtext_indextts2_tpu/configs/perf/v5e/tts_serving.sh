#!/bin/bash
# Tuned zero-shot TTS serving launch (v5e, 1 chip == 1 shard of a v5e-8 pod).
# Measured on-chip (PERF.md): 128 decode slots -> 159.6 LM streams/chip,
# effective RTF/stream ~0.0413, ~230 concurrent streams on v5e-8.
# Reference analog: MaxText/configs/v5e/*.sh tuned launch scripts.
set -e
cd "$(dirname "$0")/../../../.."
python -m maxtext_indextts2_tpu.infer.server \
  maxtext_indextts2_tpu/configs/models/tts-1b.yml \
  per_device_batch_size=128 decode_attention=ragged serve_unroll_layers=true \
  serve_params_dtype=bfloat16 max_target_length=2048 \
  "$@"
