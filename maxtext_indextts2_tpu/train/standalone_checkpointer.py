"""Checkpoint save/restore throughput benchmark.

Reference: MaxText/standalone_checkpointer.py. Measures Orbax save + restore
wall time for the configured model without running any training math.

Run: ``python -m maxtext_indextts2_tpu.train.standalone_checkpointer <cfg> ...``
"""

from __future__ import annotations

import json
import time

import jax

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import create_device_mesh
from maxtext_indextts2_tpu.train.checkpointing import CheckpointManager
from maxtext_indextts2_tpu.train.train import setup_train_state


def run(cfg, rounds: int = 3) -> dict:
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, _ = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    nbytes = sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(state))

    mgr = CheckpointManager(cfg)
    save_times, restore_times = [], []
    for i in range(rounds):
        t0 = time.perf_counter()
        mgr.save(i, state, force=True)
        mgr.wait()
        save_times.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        mgr.maybe_restore(state)
        restore_times.append(time.perf_counter() - t0)
    mgr.close()
    gb = nbytes / 1e9
    return {
        "state_gb": round(gb, 3),
        "save_s": [round(t, 3) for t in save_times],
        "restore_s": [round(t, 3) for t in restore_times],
        "save_gbps": round(gb / min(save_times), 3),
        "restore_gbps": round(gb / min(restore_times), 3),
    }


def main(argv=None):
    import sys

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    cfg.enable_checkpointing = True
    cfg.async_checkpointing = False
    print(json.dumps(run(cfg)))


if __name__ == "__main__":
    main()
