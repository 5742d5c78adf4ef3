#!/bin/bash
# Pending on-chip S2A measurement queue (PERF.md "S2A int8 anatomy" —
# relay outage interrupted these). Run on the real TPU when the relay is
# back; each stage prints one JSON line. Order matters: (1) re-baselines
# bf16 under rotate-half RoPE, (2) measures int8-offline with the fused
# quant kernel, (3) measures the serve-time bf16 weight cast. Afterwards,
# run `python bench.py` and update the README headline from its output.
set -e
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label ===" >&2
  timeout 3000 python - "$@" <<'EOF'
import json
import os
import sys

if os.environ.get("MTT_PLATFORM"):  # sitecustomize clobbers JAX_PLATFORMS
    import jax

    jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])

import benchmarks.tts_rtf as t

if os.environ.get("QUEUE_TINY"):  # CPU plumbing validation
    t.TINY = True

kwargs = json.loads(sys.argv[1])
out = t.bench_s2a(8 if not t.TINY else 2, **kwargs)
print(json.dumps({"stage": sys.argv[2], **out}), flush=True)
EOF
}

run "1/4 bf16 + rotate-half (new baseline)" '{}' bf16_rotate_half
MTT_FUSED_QUANT=1 run "2/4 int8 offline + fused quant" '{"int8": "offline"}' int8_offline_fused
run "3/4 bf16 weight cast" '{"bf16_weights": true}' bf16_weights
# structural lever: halved step schedule (reference default is 10,4x11=54
# denoiser calls + CFG; this is 8,2x11=30 calls). Throughput datum only —
# quality tradeoff needs trained weights.
run "4/4 reduced step schedule" '{"timesteps": [8,2,2,2,2,2,2,2,2,2,2,2]}' steps_8_2x11

echo "=== full bench.py ===" >&2
timeout 5400 python bench.py
