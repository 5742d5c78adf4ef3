#!/bin/bash
# MCD parity end-to-end (VERDICT r1 item #3; BASELINE.md "MCD parity"):
# train the tiny acoustic codec on synthetic speech-like waveforms,
# reconstruct a HELD-OUT set through quantize->vq2emb->decode, and gate on
# mel-cepstral distortion (trained < 0.7x untrained anchor AND < 24 dB —
# under the between-different-utterances line, see benchmarks/recipes/
# mcd_parity.py for the calibration).
set -e
cd "$(dirname "$0")/.."
python benchmarks/recipes/mcd_parity.py "$@"
