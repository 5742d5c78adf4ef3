"""Block until the TPU relay answers, then optionally run a command.

The axon relay wedges for hours at a time (PERF.md, memory notes); this
probes in a subprocess with a hard timeout — the hang lives in backend
init, so the probe must be a separate process — and execs the given
command when a trivial device fetch succeeds.

Usage:
  python tools/wait_for_tpu.py                         # just wait, print UP
  python tools/wait_for_tpu.py -- bash benchmarks/s2a_queue.sh
  python tools/wait_for_tpu.py --interval 600 --probe_timeout 900 -- ...
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

PROBE = (
    "import jax, numpy as np;"
    "d = jax.devices();"
    "x = float(np.asarray(jax.numpy.ones(3).sum()));"
    "print('TPU_UP', d[0].platform, x, flush=True)"
)


def probe(timeout_s: float) -> bool:
    try:
        out = subprocess.run(
            [sys.executable, "-c", PROBE],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return out.returncode == 0 and "TPU_UP" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    cmd = []
    if "--" in argv:
        i = argv.index("--")
        argv, cmd = argv[:i], argv[i + 1:]
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=600,
                    help="seconds between probes")
    ap.add_argument("--probe_timeout", type=float, default=900,
                    help="per-probe timeout (first fetch can take minutes)")
    ap.add_argument("--max_hours", type=float, default=24.0)
    args = ap.parse_args(argv)

    deadline = time.time() + args.max_hours * 3600
    attempt = 0
    while time.time() < deadline:
        attempt += 1
        t0 = time.time()
        if probe(args.probe_timeout):
            print(f"UP after {attempt} probes", flush=True)
            if cmd:
                raise SystemExit(subprocess.run(cmd).returncode)
            return
        print(f"down (probe {attempt}, {time.time() - t0:.0f}s)", flush=True)
        time.sleep(args.interval)
    print("gave up: max_hours reached", flush=True)
    raise SystemExit(1)


if __name__ == "__main__":
    main()
