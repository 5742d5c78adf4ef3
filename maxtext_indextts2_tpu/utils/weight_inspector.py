"""Checkpoint/weight inspector (reference: MaxText/weight_inspector.py).

Prints per-leaf shape/dtype/stats for a params-only checkpoint or a live
pytree; flags NaN/Inf and all-zero tensors.

Run: ``python -m maxtext_indextts2_tpu.utils.weight_inspector --path <ckpt>``
"""

from __future__ import annotations

import numpy as np


def inspect_tree(params, max_leaves: int | None = None) -> list[dict]:
    import jax

    rows = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        arr = np.asarray(jax.device_get(leaf))
        rows.append({
            "name": jax.tree_util.keystr(path),
            "shape": list(arr.shape),
            "dtype": str(arr.dtype),
            "mean": float(arr.mean()) if arr.size else 0.0,
            "std": float(arr.std()) if arr.size else 0.0,
            "min": float(arr.min()) if arr.size else 0.0,
            "max": float(arr.max()) if arr.size else 0.0,
            "nonfinite": int((~np.isfinite(arr.astype(np.float64))).sum()),
            "all_zero": bool((arr == 0).all()),
        })
        if max_leaves and len(rows) >= max_leaves:
            break
    return rows


def main(argv=None):
    import argparse

    from maxtext_indextts2_tpu.train.checkpointing import load_params_only

    ap = argparse.ArgumentParser()
    ap.add_argument("--path", required=True)
    ap.add_argument("--max_leaves", type=int, default=None)
    args = ap.parse_args(argv)
    params = load_params_only(args.path)
    total = 0
    for row in inspect_tree(params, args.max_leaves):
        total += int(np.prod(row["shape"]))
        flags = []
        if row["nonfinite"]:
            flags.append(f"NONFINITE={row['nonfinite']}")
        if row["all_zero"]:
            flags.append("ALL_ZERO")
        print(f"{row['name']:<70} {str(row['shape']):<24} {row['dtype']:<10}"
              f" mean={row['mean']:+.3e} std={row['std']:.3e} {' '.join(flags)}")
    print(f"total params: {total:,}")


if __name__ == "__main__":
    main()
