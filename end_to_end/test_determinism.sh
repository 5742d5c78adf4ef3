#!/bin/bash
# Same-seed bit-identical losses (reference: test_determinism.sh).
set -e
cd "$(dirname "$0")/.."
python benchmarks/determinism.py
