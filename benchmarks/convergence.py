"""Convergence smoke benchmark: tiny LM must memorize a fixed synthetic batch.

Reference: end_to_end/tpu/test_convergence_1b_params.sh — there a 1B model
trains on c4 and asserts a loss threshold; here the deterministic synthetic
iterator (same batch every step) gives a dataset-free equivalent whose loss
must collapse well below the ln(V) random floor.

Usage:  python benchmarks/convergence.py [key=value ...]
Prints one JSON line: initial/final loss, floor, converged flag.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys

import jax
import numpy as np


def run(argv: list[str] | None = None) -> dict:
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
        "steps=60", "learning_rate=3e-3", "warmup_steps_fraction=0.1",
        "dataset_type=synthetic",
    ] + list(argv or []))

    model, mesh, state, shardings, _, data_iter = setup_train_loop(cfg)
    p_step = jit_train_step(model, cfg, mesh, shardings)
    dshard = batch_sharding(mesh)
    rng = jax.random.PRNGKey(cfg.seed)

    losses = []
    with mesh:
        for step in range(cfg.steps):
            batch = jax.tree.map(lambda x: jax.device_put(x, dshard), next(data_iter))
            rng, srng = jax.random.split(rng)
            state, metrics = p_step(state, batch, srng)
            losses.append(float(metrics["loss"]))

    floor = float(np.log(cfg.vocab_size))
    result = {
        "metric": "convergence_final_loss",
        "value": round(losses[-1], 4),
        "unit": "nats",
        "detail": {
            "initial_loss": round(losses[0], 4),
            "random_floor": round(floor, 4),
            "steps": cfg.steps,
            "converged": losses[-1] < 0.5 * losses[0],
        },
    }
    return result


if __name__ == "__main__":
    print(json.dumps(run(sys.argv[1:])))
