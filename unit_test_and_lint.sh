#!/bin/bash
# Local CI entry (reference: unit_test_and_lint.sh): syntax gate + unit
# suite on the virtual CPU mesh. Usage: bash unit_test_and_lint.sh [pytest args]
set -e
cd "$(dirname "$0")"
python -m compileall -q maxtext_indextts2_tpu benchmarks tools tests end_to_end
MTT_PLATFORM=cpu XLA_FLAGS="--xla_force_host_platform_device_count=8 ${XLA_FLAGS:-}" \
  python -m pytest tests/ -q "$@"
