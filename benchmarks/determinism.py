"""Determinism check: two same-seed runs must produce bit-identical losses.

Reference: end_to_end/tpu determinism tests (same-seed runs diffed on
metrics). jax_threefry_partitionable + fixed data seeds make the whole
train step deterministic on a fixed topology.

Usage:  python benchmarks/determinism.py [key=value ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys

import jax


def _run_once(overrides):
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.train import (
        batch_sharding,
        jit_train_step,
        setup_train_loop,
    )

    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
        "vocab_size=256", "max_target_length=128", "per_device_batch_size=1",
        "steps=8", "dataset_type=synthetic",
    ] + list(overrides))
    model, mesh, state, shardings, _, data_iter = setup_train_loop(cfg)
    p_step = jit_train_step(model, cfg, mesh, shardings)
    dshard = batch_sharding(mesh)
    rng = jax.random.PRNGKey(cfg.seed)
    losses = []
    with mesh:
        for _ in range(cfg.steps):
            batch = jax.tree.map(lambda x: jax.device_put(x, dshard), next(data_iter))
            rng, srng = jax.random.split(rng)
            state, metrics = p_step(state, batch, srng)
            losses.append(float(metrics["loss"]))
    return losses


def run(argv=None) -> dict:
    a = _run_once(argv or [])
    b = _run_once(argv or [])
    deterministic = a == b
    return {
        "metric": "determinism",
        "value": 1.0 if deterministic else 0.0,
        "unit": "bool",
        "detail": {"run_a": a, "run_b": b},
    }


if __name__ == "__main__":
    out = run(sys.argv[1:])
    print(json.dumps(out))
    sys.exit(0 if out["value"] == 1.0 else 1)
