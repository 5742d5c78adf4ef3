#!/bin/bash
# Style gate (reference: code_style.sh runs pylint/pyink). Formatter-free
# equivalent: syntax gate + the cheap static checks that catch real defects
# (undefined names, unused imports via pyflakes when available).
set -e
cd "$(dirname "$0")"
python -m compileall -q maxtext_indextts2_tpu benchmarks tools tests end_to_end
if python -c "import pyflakes" 2>/dev/null; then
  python -m pyflakes maxtext_indextts2_tpu benchmarks tools
else
  echo "pyflakes not installed; syntax gate only"
fi
echo "code_style: ok"
