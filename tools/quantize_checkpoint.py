"""Offline checkpoint quantization: float params -> int8w_serve params.

Reference: MaxText load_and_quantize_checkpoint.py / layerwise_quantization.py
(AQT convert mode writes a servable quantized checkpoint). Here the engine's
serving structure (int8 kernels + per-output-channel scales, see
ops/quantization.py quantize_params_for_serving) is materialized once and
saved as a params-only orbax checkpoint, so serving jobs skip the
load-float-then-convert step and read half the bytes from storage.

Usage:
  python tools/quantize_checkpoint.py load_parameters_path=<ckpt> \
      save_path=<out_ckpt> [key=value config overrides ...]

Without load_parameters_path the params are random-initialized (useful for
smoke-testing the flow).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(argv=None) -> dict:
    import dataclasses

    import jax

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine
    from maxtext_indextts2_tpu.train.checkpointing import save_params_only

    argv = list(argv or [])
    save_path = ""
    keep = []
    for a in argv:
        if a.startswith("save_path="):
            save_path = a.split("=", 1)[1]
        else:
            keep.append(a)
    if not save_path:
        raise SystemExit("save_path=<dir> is required")

    cfg = load_config(keep + ["quantization=int8w_serve"])
    eng = Engine(cfg)
    eng.load_params()  # loads float ckpt (or random-init) then converts

    save_params_only(save_path, eng.params)

    n_int8 = sum(
        x.size for x in jax.tree.leaves(eng.params) if x.dtype == "int8"
    )
    n_total = sum(x.size for x in jax.tree.leaves(eng.params))
    return {
        "metric": "quantize_checkpoint",
        "value": round(n_int8 / max(n_total, 1), 4),
        "unit": "fraction_int8_params",
        "detail": {"save_path": save_path, "total_params": int(n_total)},
    }


if __name__ == "__main__":
    print(json.dumps(run(sys.argv[1:])))
