"""Queued MFU trials for the next on-chip session (v5e single chip).

Sweeps the likeliest improvements over the recorded best (flash, batch 4,
remat=minimal -> 43.2% MFU): no-remat variants, bf16 master weights, batch
2, and taller flash kv blocks. Run directly on TPU:
  python benchmarks/mfu_trials.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep import train_trial  # noqa: E402

BEST = ["per_device_batch_size=4", "remat_policy=minimal", "attention=flash",
        "flash_block_sizes=[1024,1024]", "scan_layers=false"]
TRIALS = (
    BEST,  # re-measure the recorded best (56.7% MFU, unrolled)
    BEST + ["weight_dtype=bfloat16"],
    BEST[:-1] + ["scan_layers=true"],  # the old scanned baseline (45.1%)
)


def main():
    for ov in TRIALS:
        try:
            print(json.dumps(train_trial(ov)), flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping past OOMs
            print(json.dumps({"overrides": ov, "error": repr(e)}), flush=True)


if __name__ == "__main__":
    main()
