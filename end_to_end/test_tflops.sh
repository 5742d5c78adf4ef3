#!/bin/bash
# TFLOPs threshold gate on real hardware (reference: test_tflops_*.sh).
# Usage: end_to_end/test_tflops.sh [min_mfu_fraction]  (default 0.30)
set -e
cd "$(dirname "$0")/.."
MIN=${1:-0.30}
python bench.py | python -c "
import json, sys
r = json.loads(sys.stdin.readlines()[-1])
assert r['value'] >= $MIN, f\"MFU {r['value']} < $MIN\"
print('tflops PASS:', r['value'], 'MFU')"
