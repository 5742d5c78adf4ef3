"""Benchmark sweep runner.

Reference: MaxText/benchmarks/ (WorkloadConfig:86, xpk workload generation,
per-platform model libraries). Without a cluster scheduler this runs sweeps
in-process on the attached chips and writes one jsonl line per trial:

    python benchmarks/sweep.py --sweep train_mfu --out /tmp/sweep.jsonl

Sweeps: train_mfu (batch x remat x attention), decode (slots x prefill),
flash_blocks (kernel block sizes).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


BASE = [
    "decoder_block=tts",
    "base_emb_dim=1024", "base_num_query_heads=8", "base_num_kv_heads=8",
    "base_mlp_dim=4096", "base_num_decoder_layers=12", "head_dim=128",
    "vocab_size=9344", "max_target_length=2048", "scan_layers=true",
]


def train_trial(overrides: list[str], steps_timed: int = 6) -> dict:
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
    from maxtext_indextts2_tpu.train.train import (
        batch_sharding,
        jit_train_step,
        setup_train_state,
    )
    from maxtext_indextts2_tpu.utils import flops as flops_lib

    cfg = load_config(BASE + overrides)
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    p_step = jit_train_step(model, cfg, mesh, shardings)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)),
        next(SyntheticDataIterator(cfg)),
    )
    rng = jax.random.PRNGKey(1)
    with mesh:
        # two warmup steps: call 2 can recompile when buffer donation
        # changes layouts (observed: weight_dtype=bfloat16 gave negative
        # slope timings with a single warmup)
        state, m = p_step(state, batch, rng)
        _sync(m["loss"])
        state, m = p_step(state, batch, rng)
        _sync(m["loss"])
        t0 = time.perf_counter()
        for _ in range(2):
            state, m = p_step(state, batch, rng)
        _sync(m["loss"])
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        for _ in range(2 + steps_timed):
            state, m = p_step(state, batch, rng)
        _sync(m["loss"])
        t2 = time.perf_counter() - t0
    dt = (t2 - t1) / steps_timed
    tflops = flops_lib.training_tflops_per_step(cfg)
    return {
        "overrides": overrides,
        "step_time_s": round(dt, 4),
        "per_device_tflops_per_s": round(tflops / dt / cfg.num_devices, 2),
    }


SWEEPS = {
    "train_mfu": [
        [f"per_device_batch_size={b}", f"remat_policy={r}", f"attention={a}"]
        for b, r, a in itertools.product(
            (4, 8, 16), ("minimal", "full"), ("flash",)
        )
    ],
    "flash_blocks": [
        ["per_device_batch_size=8", "attention=flash", f"flash_block_sizes=[{bq},{bk}]"]
        for bq, bk in ((256, 256), (512, 512), (512, 1024), (1024, 512))
    ],
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sweep", default="train_mfu", choices=sorted(SWEEPS))
    ap.add_argument("--out", default="/tmp/sweep.jsonl")
    args = ap.parse_args()

    with open(args.out, "a") as f:
        for overrides in SWEEPS[args.sweep]:
            try:
                result = train_trial(overrides)
            except Exception as e:  # noqa: BLE001 — record and continue the sweep
                result = {"overrides": overrides, "error": repr(e)}
            print(json.dumps(result), flush=True)
            f.write(json.dumps(result) + "\n")


if __name__ == "__main__":
    main()
