"""Elastic-training recipe: training survives injected step failures.

Reference: benchmarks/recipes/ Pathways elastic recipes +
elastic_train.py (elastic_handler rebuild/restore loop). Demonstrates the
framework's snapshot-recovery path end-to-end:

1. run `elastic_train_loop` with a failure injector that raises at chosen
   steps (simulated slice loss),
2. the loop rebuilds the world, restores the last host-RAM snapshot, and
   rewinds to the snapshot step,
3. assert the run finishes all steps with the expected recovery count and
   a finite final loss.

Usage:  python benchmarks/recipes/elastic_training.py [key=value ...]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def run(argv=None) -> dict:
    import numpy as np

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.elastic import elastic_train_loop

    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
        "vocab_size=256", "max_target_length=128", "per_device_batch_size=1",
        "dataset_type=synthetic", "steps=12", "enable_checkpointing=false",
    ] + list(argv or []))

    fail_at = {3, 8}  # one failure after the step-0 snapshot, one after step-5
    fired = set()

    def injector(step: int):
        if step in fail_at and step not in fired:
            fired.add(step)
            raise RuntimeError(f"injected slice loss at step {step}")

    out = elastic_train_loop(cfg, snapshot_period=5, failure_injector=injector)
    loss = float(np.asarray(out["loss"]))
    verdict = {
        "final_step": int(out["final_step"]),
        "recoveries": int(out["recoveries"]),
        "final_loss": round(loss, 4),
        "ok": bool(
            out["final_step"] == cfg.steps
            and out["recoveries"] == len(fail_at)
            and np.isfinite(loss)
        ),
    }
    return verdict


if __name__ == "__main__":
    result = run(sys.argv[1:])
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)
