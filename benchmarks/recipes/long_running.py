"""Long-running soak recipe: sustained training with checkpoints + goodput.

Reference: benchmarks/recipes/ long-running Pathways recipes. Runs a
many-step training job with periodic checkpointing and heartbeat, then
reports step-time stability (p50/p95 drift is how soak regressions show up)
and goodput (productive step time / wall time).

Defaults are sized for a quick CI pass; raise `steps` for a real soak:
  python benchmarks/recipes/long_running.py steps=2000
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def run(argv=None) -> dict:
    import numpy as np

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.train import train_loop

    ckpt_dir = tempfile.mkdtemp(prefix="long_running_")
    metrics_file = os.path.join(ckpt_dir, "metrics.jsonl")
    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
        "vocab_size=256", "max_target_length=128", "per_device_batch_size=1",
        "dataset_type=synthetic", "steps=40", "enable_checkpointing=true",
        "checkpoint_period=10", f"checkpoint_dir={ckpt_dir}",
        f"metrics_file={metrics_file}",
    ] + list(argv or []))

    t0 = time.perf_counter()
    final_metrics = train_loop(cfg)
    wall = time.perf_counter() - t0

    with open(metrics_file) as f:
        metrics_hist = [json.loads(line) for line in f]
    step_times = np.asarray(
        [m["step_time_s"] for m in metrics_hist if m.get("step_time_s")],
        np.float64,
    )
    # Stability is judged over STEADY steps only: drop the compile step and
    # checkpoint-boundary steps (save dispatch makes those a known-slower
    # population — a real soak regression shows up as drift in the steady
    # ones; checkpoint cost is reported separately below). The final step's
    # save dispatches AFTER its step_time_s is recorded, so it counts as
    # steady. Under async checkpointing the background Orbax write can bleed
    # into the step right after the boundary, so that one is excluded too.
    period = max(int(cfg.checkpoint_period), 1)
    steady, ckpt_steps = [], []
    for m in metrics_hist:
        if not m.get("step_time_s") or m["step"] == 0:
            continue
        is_ckpt = m["step"] % period == 0 or (
            cfg.async_checkpointing and m["step"] % period == 1
        )
        (ckpt_steps if is_ckpt else steady).append(m["step_time_s"])
    st = np.asarray(steady if steady else step_times[1:], np.float64)
    p50 = float(np.percentile(st, 50)) if st.size else float("nan")
    p95 = float(np.percentile(st, 95)) if st.size else float("nan")
    ckpt_p95 = float(np.percentile(ckpt_steps, 95)) if ckpt_steps else 0.0
    loss = float(np.asarray(final_metrics["loss"]))
    ckpts = [d for d in sorted(os.listdir(ckpt_dir)) if d.isdigit()]
    return {
        "steps": cfg.steps,
        "wall_s": round(wall, 2),
        "step_p50_s": round(p50, 4),
        "step_p95_s": round(p95, 4),
        "ckpt_step_p95_s": round(ckpt_p95, 4),
        "goodput": round(min(float(np.sum(step_times)) / max(wall, 1e-9), 1.0), 3),
        "final_loss": round(loss, 4),
        "checkpoints": len(ckpts),
        "ok": bool(
            np.isfinite(loss) and len(ckpts) > 0
            and (st.size < 4 or p95 < 10 * p50)
        ),
    }


if __name__ == "__main__":
    result = run(sys.argv[1:])
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)
