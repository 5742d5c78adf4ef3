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
    emergency = run_emergency(argv)
    return {
        "metric": "suspend_resume",
        "value": 1.0 if (resumed_from_ckpt and emergency["ok"]) else 0.0,
        "unit": "bool",
        "detail": {
            "latest_checkpoint_step": latest,
            "final_loss": float(metrics["loss"]),
            "ckpt_dir": ckpt_dir,
            "emergency": emergency,
        },
    }


def run_emergency(argv=None) -> dict:
    """Emergency-tier variant (reference: checkpointing.py:144): preemption
    lands BETWEEN persistent saves; resume must come from the high-frequency
    LOCAL tier, losing at most local_checkpoint_period steps."""
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.checkpointing import (
        EmergencyCheckpointManager,
    )
    from maxtext_indextts2_tpu.train.train import train_loop

    ckpt_dir = tempfile.mkdtemp(prefix="emergency_resume_")
    local_dir = tempfile.mkdtemp(prefix="emergency_local_")
    base = [
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
        "vocab_size=256", "max_target_length=128", "per_device_batch_size=1",
        "dataset_type=synthetic", "enable_checkpointing=true",
        "enable_emergency_checkpoint=true",
        # persistent tier never fires before the preemption; only the local
        # tier (every 2 steps) can carry the resume
        "checkpoint_period=100", "local_checkpoint_period=2",
        "save_final_checkpoint=false",
        f"checkpoint_dir={ckpt_dir}", f"local_checkpoint_directory={local_dir}",
    ] + list(argv or [])

    cfg1 = load_config(base + ["steps=8"])
    train_loop(cfg1)  # local saves at steps 1,3,5,7; persistent: none

    metrics_file = os.path.join(ckpt_dir, "resume_metrics.jsonl")
    cfg2 = load_config(base + ["steps=12", f"metrics_file={metrics_file}"])
    metrics = train_loop(cfg2)

    # the resumed run must START at the local checkpoint's step + 1, proving
    # the restore came from the local tier (persistent has nothing)
    with open(metrics_file) as f:
        first_resumed_step = json.loads(f.readline())["step"]

    mgr = EmergencyCheckpointManager(cfg2)
    local_latest = mgr.local.latest_step()
    persistent_latest = mgr.persistent.latest_step()
    mgr.close()
    return {
        "ok": bool(local_latest is not None and local_latest >= 7
                   and persistent_latest is None
                   and first_resumed_step == 8
                   and float(metrics["loss"]) > 0),
        "local_latest": local_latest,
        "persistent_latest": persistent_latest,
        "first_resumed_step": first_resumed_step,
    }


if __name__ == "__main__":
    out = run(sys.argv[1:])
    print(json.dumps(out))
    sys.exit(0 if out["value"] == 1.0 else 1)
