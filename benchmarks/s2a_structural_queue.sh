#!/bin/bash
# On-chip S2A sampler-structure measurement queue (round 2, VERDICT item #2).
# All configs below passed the MCD quality gate
# (benchmarks/recipes/s2a_schedule_gate.py, PERF.md "S2A sampler-structure
# quality gate"): reduced = ~56% of the reference's 54 steps (analog of the
# gate's [3,2,2,2] from [4,4,4,4]), cfg_half = uncond denoiser calls only on
# the first half of each layer's steps. Numerics fixed at the certified
# serving combo: int8-offline matmuls + bf16 residual stream.
# Each stage prints one JSON line; afterwards update bench.py's headline
# S2A config from the winner and re-run `python bench.py`.
set -e
cd "$(dirname "$0")/.."

run() {
  local label="$1"; shift
  echo "=== $label ===" >&2
  timeout 3600 python - "$@" <<'EOF'
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
batch = int(kwargs.pop("batch", 8 if not t.TINY else 2))
out = t.bench_s2a(batch, **kwargs)
print(json.dumps({"stage": sys.argv[2], **out}), flush=True)
EOF
}

BASE='"int8": "offline", "bf16_weights": true'
RED='[8,2,2,2,2,2,2,2,2,2,2,2]'

run "1/6 full schedule (re-baseline)" "{$BASE}" full
run "2/6 full + cfg_until=0.5" "{$BASE, \"cfg_until\": 0.5}" cfg_half
run "3/6 reduced 8+2x11" "{$BASE, \"timesteps\": $RED}" reduced
run "4/6 reduced + cfg_until=0.5" \
  "{$BASE, \"timesteps\": $RED, \"cfg_until\": 0.5}" reduced_cfg_half
# batch sweep at the winning structure: S2A measured 40-49% MXU at b8 —
# a larger batch may lift utilization (streams scale if pass_s sublinear)
run "5/8 reduced_cfg_half batch 16" \
  "{$BASE, \"timesteps\": $RED, \"cfg_until\": 0.5, \"batch\": 16}" rch_b16
run "6/8 reduced_cfg_half batch 32" \
  "{$BASE, \"timesteps\": $RED, \"cfg_until\": 0.5, \"batch\": 32}" rch_b32
# round-2 follow-up candidates, both MCD-gate-passed (s2a_schedule_gate.py
# minimal_cfg_half / reduced_cfg_quarter)
MIN='[6,1,1,1,1,1,1,1,1,1,1,1]'
run "7/8 minimal 6+1x11 + cfg_until=0.5" \
  "{$BASE, \"timesteps\": $MIN, \"cfg_until\": 0.5}" minimal_cfg_half
run "8/8 reduced + cfg_until=0.25" \
  "{$BASE, \"timesteps\": $RED, \"cfg_until\": 0.25}" reduced_cfg_quarter
