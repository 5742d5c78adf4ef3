#!/usr/bin/env bash
# Preflight checks for a TPU training/serving host (reference capability:
# the reference root preflight.sh + setup.sh). Verifies the environment a
# job is about to run in; exits non-zero with a specific message on the
# first failure.
set -uo pipefail

fail() { echo "PREFLIGHT FAIL: $*" >&2; exit 1; }
ok() { echo "preflight: $*"; }

# 1. python + required packages at the pinned versions
python - <<'EOF' || fail "python deps"
import importlib.metadata as md
import sys

REQUIRED = ["jax", "flax", "optax", "orbax-checkpoint", "numpy", "PyYAML"]
for pkg in REQUIRED:
    try:
        print(f"  {pkg}=={md.version(pkg)}")
    except md.PackageNotFoundError:
        sys.exit(f"missing required package: {pkg}")
EOF
ok "python deps present"

# 2. the package imports and a config loads (no accelerator touched)
MTT_PLATFORM=cpu python - <<'EOF' || fail "package import / config load"
from maxtext_indextts2_tpu.config import load_config
cfg = load_config([
    "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=1",
    "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
    "vocab_size=256", "max_target_length=64",
])
assert cfg.global_batch_size_to_train_on > 0
EOF
ok "package + config"

# 3. accelerators visible (skipped with PREFLIGHT_SKIP_TPU=1 for CPU hosts)
if [ "${PREFLIGHT_SKIP_TPU:-0}" != "1" ]; then
  python - <<'EOF' || fail "no TPU devices visible (set PREFLIGHT_SKIP_TPU=1 for CPU-only hosts)"
import jax
devs = jax.devices()
assert devs, "no devices"
print(f"  {len(devs)} device(s): {devs[0].platform}")
EOF
  ok "devices visible"
fi

# 4. output directory writable (where checkpoints/metrics land)
OUT="${MTT_BASE_OUTPUT_DIRECTORY:-/tmp/mtt-preflight}"
mkdir -p "$OUT" && touch "$OUT/.preflight" && rm -f "$OUT/.preflight" \
  || fail "output directory $OUT not writable"
ok "output dir writable ($OUT)"

echo "preflight: ALL OK"
