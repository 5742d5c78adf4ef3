#!/bin/bash
# Convergence gate (reference: test_convergence_1b_params.sh): loss must
# collapse below half its initial value on the memorizable synthetic set.
set -e
cd "$(dirname "$0")/.."
python benchmarks/convergence.py | python -c '
import json, sys
r = json.load(sys.stdin)
assert r["detail"]["converged"], r
print("convergence PASS:", r["value"], "nats from", r["detail"]["initial_loss"])'
