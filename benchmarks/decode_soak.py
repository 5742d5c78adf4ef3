"""Sustained-load decode soak: isolate the serving stack's failure trigger.

The full-pipeline serving bench (benchmarks/tts_slo.py) dies after ~60-90 s
of sustained load with 'TPU backend error (Internal)' on a decode dispatch,
after which the relay refuses program work for minutes (PERF.md round-3/4
campaigns). This harness binary-searches the ingredient that triggers it by
driving the SAME engine programs the orchestrator uses, one ingredient at a
time, from a single thread:

  python benchmarks/decode_soak.py minutes=5                 # generate_n only
  python benchmarks/decode_soak.py minutes=5 churn=1         # + prefill/insert/release cycle
  python benchmarks/decode_soak.py minutes=5 s2a=1           # + an S2A pass every ~0.6 s of decode
  python benchmarks/decode_soak.py minutes=5 churn=1 s2a=1   # the serving mix

Per-dispatch wall time is logged (every `log_every`), failures get a full
traceback plus one refresh+rebuild recovery attempt so the soak can observe
whether the device comes back. Final line is one JSON summary.

Reference discipline: inference_microbenchmark-style sustained loops
(MaxText/inference_microbenchmark.py) — but aimed at fault isolation, not
throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.tts_slo import PROD_CFG, TINY_CFG  # noqa: E402


def run(argv=None) -> dict:
    kv = dict(a.split("=", 1) for a in (argv or []))
    if int(kv.get("thread", "0")):
        # decisive isolation experiment: the IDENTICAL soak body, but on a
        # spawned (non-main) thread while main sleeps — every stable run so
        # far dispatched from the main thread, and every failing serving
        # process dispatches from the orchestrator's spawned thread
        import threading

        kv.pop("thread")
        box: dict = {}
        argv2 = [f"{k}={v}" for k, v in kv.items()]

        def body():
            try:
                box["out"] = run(argv2)
            except BaseException as e:  # noqa: BLE001 — surfaced below
                box["err"] = e

        th = threading.Thread(target=body)
        th.start()
        th.join()
        if "err" in box:
            raise box["err"]
        out = box["out"]
        out["off_main_thread"] = True
        return out
    tiny = bool(int(kv.get("tiny", "0")))
    minutes = float(kv.get("minutes", "1" if tiny else "5"))
    spd = int(kv.get("spd", "16"))
    churn = int(kv.get("churn", "0"))  # N release+prefill+insert cycles per dispatch
    s2a = bool(int(kv.get("s2a", "0")))
    frontend = bool(int(kv.get("frontend", "0")))  # + frontend_batch per S2A cycle
    gil = int(kv.get("gil", "0"))
    log_every = int(kv.get("log_every", "25"))

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine

    cfg = load_config(list(TINY_CFG if tiny else PROD_CFG))

    s2a_pass = None
    if s2a:
        from maxtext_indextts2_tpu.audio.pipeline import build_tiny_pipeline

        # the pipeline owns the LM engine, exactly as in serving
        pipeline = build_tiny_pipeline(cfg)
        eng = pipeline.engine
        w16 = np.zeros(16_000, np.float32)
        w24 = np.zeros(24_000, np.float32)
        body = {"text": "soak", "prompt_wav_16k": w16.tolist(),
                "prompt_wav_24k": w24.tolist()}
        sems, acs = pipeline.frontend_batch([dict(body)])
        gens = [[1] * (8 if tiny else 250)]

        def s2a_pass():
            if frontend:
                # serving runs the conformer+codec-encode programs per batch
                f_sems, f_acs = pipeline.frontend_batch([dict(body)])
            else:
                f_sems, f_acs = sems, acs
            return pipeline.s2a_vocoder_batch(
                [dict(body)], f_sems, f_acs, gens, pad_to_batch=cfg.tts_batch_max)
    else:
        eng = Engine(cfg)
        eng.load_params()

    prompt = np.arange(1, 40, dtype=np.int32) % 200
    state = eng.init_decode_state()
    # fill=N: only the first N slots active — the serving processes that
    # fail at low arrival rates run MOSTLY-EMPTY decode states (active=8 of
    # 128; inactive ragged-decode slots have valid length 0), while every
    # passing soak ran all slots full. Default: fill every slot.
    fill = int(kv.get("fill", str(eng.num_slots)))
    for slot in range(min(fill, eng.num_slots)):
        prefix, _ = eng.prefill(prompt, len(prompt))
        state = eng.insert(prefix, state, slot)

    stop_gil = None
    if gil:
        # (started AFTER slot fill: the hogs starve warmup otherwise)
        # gil=N: N background threads json-encode+decode a 5s/24kHz wav-sized
        # float list in a loop — the serving bench's HTTP handler + in-process
        # load-generator workload. If THIS kills the decode dispatches, the
        # sustained-load failures are GIL starvation of the relay client,
        # not device work.
        import json as _json
        import threading

        stop_gil = threading.Event()
        wav = np.random.default_rng(0).standard_normal(120_000).astype(np.float32)

        def hog():
            while not stop_gil.is_set():
                s = _json.dumps({"wav": wav.tolist()})
                _json.loads(s)

        for _ in range(gil):
            threading.Thread(target=hog, daemon=True).start()


    t_start = time.perf_counter()
    deadline = t_start + minutes * 60
    n_dispatch = 0
    n_s2a = 0
    failures = []
    recoveries = 0
    dt_hist: list[float] = []
    churn_slot = 0
    # one S2A pass per ~0.6 s of decode wall time matches the serving mix
    # (batcher window 200 ms at rate>=4 keeps S2A busy ~50% of the loop)
    next_s2a = t_start + 0.6

    def fail(stage: str, e: Exception):
        failures.append({
            "stage": stage, "t_s": round(time.perf_counter() - t_start, 2),
            "dispatch": n_dispatch, "error": repr(e)[:300],
        })
        print(f"[soak] FAILURE in {stage} after {n_dispatch} dispatches "
              f"t={failures[-1]['t_s']}s:\n{traceback.format_exc()}",
              file=sys.stderr)

    # stay inside max_target_length: re-fill every slot (recovery-style)
    # before positions reach the context bound
    reset_every = max(1, (cfg.max_target_length - len(prompt) - spd) // spd)

    def _soak_loop():
        nonlocal state, n_dispatch, n_s2a, churn_slot, next_s2a, recoveries
        while time.perf_counter() < deadline:
            if n_dispatch and n_dispatch % reset_every == 0:
                try:
                    state = eng.init_decode_state()
                    for slot in range(min(fill, eng.num_slots)):
                        prefix, _ = eng.prefill(prompt, len(prompt))
                        state = eng.insert(prefix, state, slot)
                except Exception as e:  # noqa: BLE001
                    fail("slot_reset", e)
                    break
            t0 = time.perf_counter()
            try:
                state, toks = eng.generate_n(state, spd)
                _ = np.asarray(toks)  # host fetch = true sync point
            except Exception as e:  # noqa: BLE001 — the event under study
                fail("generate_n", e)
                # one recovery attempt, orchestrator-style; then keep soaking
                try:
                    eng.refresh_decode()
                    eng.refresh_prefill()
                    state = eng.init_decode_state()
                    for slot in range(min(fill, eng.num_slots)):
                        prefix, _ = eng.prefill(prompt, len(prompt))
                        state = eng.insert(prefix, state, slot)
                    recoveries += 1
                    print(f"[soak] recovered after failure #{len(failures)}",
                          file=sys.stderr)
                except Exception as e2:  # noqa: BLE001
                    fail("recovery", e2)
                    break
                continue
            n_dispatch += 1
            dt_hist.append(time.perf_counter() - t0)
            if n_dispatch % log_every == 0:
                recent = dt_hist[-log_every:]
                print(f"[soak] {n_dispatch} dispatches "
                      f"t={time.perf_counter() - t_start:.0f}s "
                      f"ms/dispatch p50={1e3 * float(np.median(recent)):.1f} "
                      f"max={1e3 * max(recent):.1f}", file=sys.stderr)
            if churn:
                try:
                    # serving churn: churn slots finish and new requests land
                    # BETWEEN decode dispatches (steady-state admission runs
                    # several prefill+insert pairs back-to-back)
                    for _ in range(churn):
                        state = eng.release_slot(state, churn_slot)
                        prefix, _ = eng.prefill(prompt, len(prompt))
                        state = eng.insert(prefix, state, churn_slot)
                        churn_slot = (churn_slot + 1) % min(fill, eng.num_slots)
                except Exception as e:  # noqa: BLE001
                    fail("churn", e)
                    break
            if s2a_pass is not None and time.perf_counter() >= next_s2a:
                try:
                    s2a_pass()
                    n_s2a += 1
                    next_s2a = time.perf_counter() + 0.6
                except Exception as e:  # noqa: BLE001
                    fail("s2a", e)
                    break

    if int(kv.get("split", "0")):
        # decisive isolation: engine build + warmup + slot fill ran on THIS
        # (the calling) thread; the sustained loop now runs on a SECOND
        # thread — the exact thread lifecycle of the serving process (main
        # thread warms, the orchestrator thread serves), which is the one
        # pattern every failing run shares and every passing soak lacks
        import threading

        box: dict = {}

        def _runner():
            try:
                _soak_loop()
            except BaseException as e:  # noqa: BLE001 — surfaced below
                box["err"] = e

        th = threading.Thread(target=_runner)
        th.start()
        th.join()
        if "err" in box:
            raise box["err"]
    else:
        _soak_loop()

    if stop_gil is not None:
        stop_gil.set()
    out = {
        "tiny": tiny, "minutes": minutes, "spd": spd,
        "churn": churn, "s2a": s2a, "frontend": frontend, "gil": gil,
        "fill": fill,
        "dispatches": n_dispatch, "s2a_passes": n_s2a,
        "wall_s": round(time.perf_counter() - t_start, 1),
        "dispatch_ms_p50": round(1e3 * float(np.median(dt_hist)), 2) if dt_hist else None,
        "dispatch_ms_p99": round(1e3 * float(np.percentile(dt_hist, 99)), 2) if dt_hist else None,
        "failures": failures,
        "recoveries": recoveries,
        "time_to_first_failure_s": failures[0]["t_s"] if failures else None,
    }
    return out


if __name__ == "__main__":
    if os.environ.get("MTT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])
    print(json.dumps(run(sys.argv[1:])))
