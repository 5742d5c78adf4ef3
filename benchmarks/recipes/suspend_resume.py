"""Suspend/resume recipe: checkpointed training survives preemption.

Reference: benchmarks/recipes/ (Pathways elastic / suspend-resume
long-running recipes). Demonstrates and validates the orbax-backed flow:

1. train K steps with checkpointing enabled, then stop (simulated
   preemption — the process state is thrown away),
2. build a fresh train loop with the same config: CheckpointManager
   restores the latest step and training continues to `steps`,
3. assert the resumed run picks up at the checkpointed step.

Usage:  python benchmarks/recipes/suspend_resume.py [key=value ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import json
import sys
import tempfile


def run(argv=None) -> dict:
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.train import train_loop

    ckpt_dir = tempfile.mkdtemp(prefix="suspend_resume_")
    base = [
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
        "vocab_size=256", "max_target_length=128", "per_device_batch_size=1",
        "dataset_type=synthetic", "enable_checkpointing=true",
        "checkpoint_period=4", f"checkpoint_dir={ckpt_dir}",
    ] + list(argv or [])

    # phase 1: run 8 steps (checkpoints at steps 3 and 7), then "preempt"
    cfg1 = load_config(base + ["steps=8"])
    train_loop(cfg1)

    # phase 2: fresh process state; resume to 16
    cfg2 = load_config(base + ["steps=16"])
    metrics = train_loop(cfg2)

    from maxtext_indextts2_tpu.train.checkpointing import CheckpointManager

    mgr = CheckpointManager(cfg2)
    latest = mgr.latest_step()
    mgr.close()
    resumed_from_ckpt = latest is not None and latest >= 7
    return {
        "metric": "suspend_resume",
        "value": 1.0 if resumed_from_ckpt else 0.0,
        "unit": "bool",
        "detail": {
            "latest_checkpoint_step": latest,
            "final_loss": float(metrics["loss"]),
            "ckpt_dir": ckpt_dir,
        },
    }


if __name__ == "__main__":
    out = run(sys.argv[1:])
    print(json.dumps(out))
    sys.exit(0 if out["value"] == 1.0 else 1)
