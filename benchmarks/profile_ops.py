"""On-chip op-level profiler for the serving stages.

Runs a chosen stage (lm | s2a | vocoder) under jax.profiler.start_trace and
prints total device time by op name — the diagnostic that found the
scanned-decoder cache-copy bottleneck and the S2A f32-logits bandwidth item
(PERF.md). One JSON line per top op.

Usage (real TPU):
  python benchmarks/profile_ops.py --stage lm --slots 128 --steps 8
  python benchmarks/profile_ops.py --stage s2a --s2a_batch 8
  QUEUE_TINY=1 MTT_PLATFORM=cpu python benchmarks/profile_ops.py --stage s2a
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _apply_platform():
    if os.environ.get("MTT_PLATFORM"):  # sitecustomize clobbers JAX_PLATFORMS
        import jax

        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])


def parse_trace(trace_dir: str, top: int = 25, device_only: bool = True):
    """Sum 'dur' by event name over the newest trace in trace_dir.

    device_only drops host-side python/runtime events ($file.py:..., pjit
    wrappers) so XLA op names (fusion.N, copy.N, dynamic-slice...) surface.
    """
    paths = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        raise FileNotFoundError(f"no trace under {trace_dir}")
    ev = json.load(gzip.open(paths[-1]))["traceEvents"]
    tot = collections.Counter()
    for e in ev:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        name = e["name"]
        if device_only and (
            name.startswith("$") or ".py" in name or "PjitFunction" in name
            or name.startswith("Pjit") or name.startswith("jit(")
            or "ompile" in name or "Codegen" in name or "::" in name
            or name.startswith("Jit")
        ):
            continue
        tot[name] += e["dur"]
    return tot.most_common(top)


def main(argv=None):
    _apply_platform()
    import jax

    import benchmarks.tts_rtf as t

    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", choices=["lm", "s2a", "vocoder"], default="lm")
    ap.add_argument("--slots", type=int, default=128)
    ap.add_argument("--s2a_batch", type=int, default=8)
    ap.add_argument("--s2a_int8", default="", choices=["", "dynamic", "offline"],
                    help="S2AConfig.int8_matmul")
    ap.add_argument("--s2a_bf16_weights", action="store_true")
    ap.add_argument("--s2a_reduced", action="store_true",
                    help="certified reduced schedule (8,2x11) + cfg_until=0.5")
    ap.add_argument("--steps", type=int, default=4,
                    help="repetitions inside the trace window")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--trace_dir", default="")
    args = ap.parse_args(argv)

    if os.environ.get("QUEUE_TINY"):
        t.TINY = True

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="profile_ops_")

    # warm up OUTSIDE the trace (compile + first dispatch), then trace the
    # steady state only
    def run_once():
        if args.stage == "lm":
            return t.bench_lm_decode(args.slots)
        if args.stage == "s2a":
            kw = {}
            if args.s2a_reduced and not t.TINY:
                kw = dict(timesteps=(8,) + (2,) * 11, cfg_until=0.5)
            return t.bench_s2a(args.s2a_batch if not t.TINY else 2,
                               int8=args.s2a_int8 or False,
                               bf16_weights=args.s2a_bf16_weights, **kw)
        return t.bench_vocoder(args.s2a_batch if not t.TINY else 2)

    warm = run_once()
    jax.profiler.start_trace(trace_dir)
    for _ in range(max(1, args.steps - 1)):
        result = run_once()
    jax.profiler.stop_trace()

    print(json.dumps({"stage": args.stage, "warmup": warm, "traced": result}),
          flush=True)
    total = 0
    rows = parse_trace(trace_dir, args.top)
    for name, dur in rows:
        total += dur
    for name, dur in rows:
        print(json.dumps({
            "op": name[:120], "us": dur, "share": round(dur / max(total, 1), 4)
        }), flush=True)
    print(f"# trace dir: {trace_dir}", flush=True)


if __name__ == "__main__":
    main()
