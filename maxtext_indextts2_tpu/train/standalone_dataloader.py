"""Data-pipeline-only throughput benchmark (reference:
MaxText/standalone_dataloader.py data_load_loop). Runs the configured
iterator for N batches and reports tokens/s without any model compute.

Run: ``python -m maxtext_indextts2_tpu.train.standalone_dataloader <cfg> ...``
"""

from __future__ import annotations

import json
import time

import numpy as np

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.train.train import create_data_iterator


def run(cfg, num_batches: int = 20) -> dict:
    it = create_data_iterator(cfg)
    batch = next(it)  # warmup / build
    t0 = time.perf_counter()
    tokens = 0
    for _ in range(num_batches):
        batch = next(it)
        tokens += int(np.prod(np.asarray(batch["inputs"]).shape))
    dt = time.perf_counter() - t0
    return {
        "batches": num_batches,
        "batch_shape": list(np.asarray(batch["inputs"]).shape),
        "seconds": round(dt, 3),
        "tokens_per_s": round(tokens / dt, 1),
    }


def main(argv=None):
    import sys

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    print(json.dumps(run(cfg)))


if __name__ == "__main__":
    main()
