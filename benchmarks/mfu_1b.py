"""On-chip MFU trials at 1B+ scale (VERDICT round-1 item #1).

Sweeps training configs of the tts-1b preset (1.28B params: emb 2048,
20 layers, mlp 8192, 16q/8kv heads) on a single v5e chip. The reference's
same-hardware-family bar is 56-67% MFU at 16B-128B on v5e-256
(/root/reference/README.md:93); single-chip 1B is the largest honest
same-chip measurement available here.

  python benchmarks/mfu_1b.py            # full sweep
  python benchmarks/mfu_1b.py --best     # just the recorded best config
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sweep import train_trial  # noqa: E402

MODEL_1B = [
    "decoder_block=tts",
    "base_emb_dim=2048", "base_num_query_heads=16", "base_num_kv_heads=8",
    "base_mlp_dim=8192", "base_num_decoder_layers=20", "head_dim=128",
    "vocab_size=8704", "max_target_length=2048",
]

BEST = MODEL_1B + [
    "per_device_batch_size=4", "remat_policy=full", "attention=flash",
    "flash_block_sizes=[1024,1024]", "scan_layers=false",
    "weight_dtype=bfloat16",
]
# Memory at 1.28B bf16: weights+grads+mu+nu = 10.2 GB of the 16 GB HBM.
# remat=minimal's saved dots (~400 MB/layer at batch 4) OOM — measured
# RESOURCE_EXHAUSTED; only full remat (layer-boundary saves, ~33 MB/layer)
# leaves room at batch >= 4.

# AOT memory analysis (2026-08-19): remat=full unrolled -> temp 3.5-4.2 GB,
# peak 11.0/11.8 GB at batch 4/8 (fits); remat=minimal saves nothing on this
# model (all dots have batch dims) and prevent_cse barriers bloat it to 16.4.
TRIALS = (
    [o for o in BEST if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=8"],
    BEST,
    [o for o in BEST if not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=16"],
    [o for o in BEST if not o.startswith("scan_layers")
     and not o.startswith("per_device_batch_size")]
    + ["per_device_batch_size=8", "scan_layers=true"],
)


def main():
    trials = TRIALS[:1] if "--best" in sys.argv else TRIALS
    for ov in trials:
        try:
            print(json.dumps(train_trial(ov)), flush=True)
        except Exception as e:  # noqa: BLE001 — keep sweeping past OOMs
            print(json.dumps({"overrides": ov, "error": repr(e)[:500]}), flush=True)


if __name__ == "__main__":
    main()
