"""Driver-contract tests.

The round driver consumes three entry points; breaking any of them silently
drops the round's results, so they get their own regression tests:
- ``bench.py`` must print ONE JSON line with metric/value/unit/vs_baseline.
- ``__graft_entry__.entry()`` must return a jittable forward + example args.
- ``__graft_entry__.dryrun_multichip(8)`` must jit the sharded train step
  over an 8-device mesh and run one step (the conftest CPU mesh stands in).
"""

import json
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def test_graft_entry_forward_shape():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(jax.jit(fn), *args)
    tokens = args[1]
    assert out.shape[:2] == tokens.shape  # logits [B, S, vocab]
    assert out.shape[-1] > 0


def test_graft_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_bench_prints_one_json_line():
    env = dict(
        os.environ,
        MTT_PLATFORM="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=8",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True,
        text=True,
        env=env,
        timeout=1800,
        cwd=REPO,
    )
    json_lines = [
        ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")
    ]
    assert json_lines, (out.stdout[-2000:], out.stderr[-2000:])
    rec = json.loads(json_lines[-1])
    assert {"metric", "value", "unit", "vs_baseline"} <= set(rec)
    assert rec["value"] > 0
