"""Debug utilities: NaN/Inf finder, sharding dump/diff, hang diagnostics.

Reference: MaxText/max_utils.py:64 (NaN finder),
tests/sharding_compare_test.py + sharding_dump.py (golden sharding diffs),
cloud_tpu_diagnostics stack-trace collection (train.py:737).
"""

from __future__ import annotations

import faulthandler
import json
import sys

import jax
import numpy as np


def find_nan_inf(tree, prefix: str = "") -> list[str]:
    """Paths of leaves containing NaN/Inf (host transfer; debug only)."""
    bad = []
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        arr = np.asarray(jax.device_get(leaf))
        if not np.isfinite(arr).all():
            name = prefix + jax.tree_util.keystr(path)
            n_bad = int((~np.isfinite(arr)).sum())
            bad.append(f"{name}: {n_bad}/{arr.size} non-finite")
    return bad


def assert_finite(tree, name: str = "tree"):
    bad = find_nan_inf(tree)
    if bad:
        raise FloatingPointError(f"non-finite values in {name}:\n" + "\n".join(bad))


def dump_shardings(tree) -> dict[str, str]:
    """path -> PartitionSpec string for every array leaf."""
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        sharding = getattr(leaf, "sharding", None)
        spec = getattr(sharding, "spec", None)
        out[jax.tree_util.keystr(path)] = str(spec)
    return out


def save_sharding_golden(tree, path: str):
    with open(path, "w") as f:
        json.dump(dump_shardings(tree), f, indent=1, sort_keys=True)


def diff_shardings_vs_golden(tree, golden_path: str) -> list[str]:
    """Compare current shardings to a golden dump; return mismatch lines."""
    with open(golden_path) as f:
        golden = json.load(f)
    now = dump_shardings(tree)
    diffs = []
    for k in sorted(set(golden) | set(now)):
        if golden.get(k) != now.get(k):
            diffs.append(f"{k}: golden={golden.get(k)} now={now.get(k)}")
    return diffs


def enable_hang_diagnostics(timeout_s: float = 600.0, repeat: bool = True):
    """Dump all-thread stack traces if the process stalls (reference:
    cloud_tpu_diagnostics collect_stack_trace)."""
    faulthandler.dump_traceback_later(timeout_s, repeat=repeat, file=sys.stderr)


def disable_hang_diagnostics():
    faulthandler.cancel_dump_traceback_later()
