"""Assert metric thresholds over a run's metrics jsonl.

Reference: end_to_end/eval_assert.py (TFLOPs/loss threshold gates driven by
the e2e shell scripts). Reads the jsonl written by MetricLogger
(`metrics_file=...`) and checks expressions of the form

  python tools/eval_assert.py run.jsonl loss last lt 2.5
  python tools/eval_assert.py run.jsonl per_device_tflops_per_s mean gt 50
  python tools/eval_assert.py run.jsonl loss final_lt_initial

Exit code 0 on pass, 1 on fail (prints both sides).
"""

from __future__ import annotations

import json
import sys

AGGS = {
    "last": lambda v: v[-1],
    "first": lambda v: v[0],
    "mean": lambda v: sum(v) / len(v),
    "min": min,
    "max": max,
}
OPS = {
    "lt": lambda a, b: a < b,
    "le": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "ge": lambda a, b: a >= b,
}


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) not in (3, 5):
        print(__doc__)
        return 2
    path, key = argv[0], argv[1]
    values = []
    with open(path) as f:
        for line in f:
            row = json.loads(line)
            if key in row:
                values.append(float(row[key]))
    if not values:
        print(f"FAIL: no values for {key!r} in {path}")
        return 1

    if len(argv) == 3:
        if argv[2] != "final_lt_initial":
            print(__doc__)
            return 2
        ok = values[-1] < values[0]
        print(f"{key}: final {values[-1]:.6g} vs initial {values[0]:.6g} "
              f"-> {'PASS' if ok else 'FAIL'}")
        return 0 if ok else 1

    agg, op, threshold = argv[2], argv[3], float(argv[4])
    val = AGGS[agg](values)
    ok = OPS[op](val, threshold)
    print(f"{key} {agg} = {val:.6g} {op} {threshold} "
          f"-> {'PASS' if ok else 'FAIL'} ({len(values)} samples)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
