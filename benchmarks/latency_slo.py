"""Latency-SLO serving benchmark: poisson load against the HTTP server.

Loadgen-style harness (reference capability: MaxText/inference_mlperf/
offline_mode.py:541 — the latency-bounded serving discipline mlperf's
loadgen enforces). Requests arrive as a poisson process at ``rate`` req/s;
each opens POST /generate_stream and records

- TTFB: arrival -> first streamed token (queueing + prefill + insert),
- e2e: arrival -> stream close,
- tokens/s/stream while decoding.

Reported: p50/p95/p99 TTFB and e2e, achieved throughput, and (for the
50 Hz audio-token rate) the fraction of requests whose decode kept up with
real time. Run on-chip:

  python benchmarks/latency_slo.py rate=8 duration=30 gen_tokens=250

CPU plumbing check:  MTT_PLATFORM=cpu python benchmarks/latency_slo.py tiny=1
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# 0.8B TTS LM serving config (benchmarks/tts_rtf.py bench_lm_decode's model)
SERVE_CFG = [
    "decoder_block=tts",
    "base_emb_dim=1536", "base_num_query_heads=12", "base_num_kv_heads=4",
    "base_mlp_dim=6144", "base_num_decoder_layers=14", "head_dim=128",
    "vocab_size=9344", "max_target_length=2048",
    "max_prefill_predict_length=512",
    "decode_sampling_strategy=greedy", "decode_attention=ragged",
    "serve_params_dtype=bfloat16", "scan_layers=false",
]
TINY_CFG = [
    "decoder_block=tts",
    "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
    "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
    "vocab_size=512", "max_target_length=256", "max_prefill_predict_length=32",
    "decode_sampling_strategy=greedy", "scan_layers=false",
]
TOKEN_HZ = 50.0  # audio token rate: decode must sustain 50 tok/s/stream


def _percentiles(xs, ps=(50, 95, 99)):
    if not xs:
        return {f"p{p}": None for p in ps}
    return {f"p{p}": round(float(np.percentile(xs, p)), 4) for p in ps}


def run(argv=None) -> dict:
    import http.client

    kv = dict(a.split("=", 1) for a in (argv or []))
    tiny = bool(int(kv.get("tiny", "0")))
    rate = float(kv.get("rate", "2" if tiny else "8"))  # requests / s
    duration = float(kv.get("duration", "10" if tiny else "30"))
    gen_tokens = int(kv.get("gen_tokens", "16" if tiny else "250"))
    prompt_len = int(kv.get("prompt_len", "8" if tiny else "64"))
    slots = kv.get("slots")

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine
    from maxtext_indextts2_tpu.infer.server import make_server

    overrides = list(TINY_CFG if tiny else SERVE_CFG)
    if slots:
        overrides.append(f"per_device_batch_size={slots}")
    elif not tiny:
        overrides.append("per_device_batch_size=64")
    if kv.get("mode"):  # interleaved (default) | disaggregated
        overrides.append(f"serving_mode={kv['mode']}")
    if kv.get("spd"):  # generate_n fusion depth (serving_steps_per_dispatch)
        overrides.append(f"serving_steps_per_dispatch={kv['spd']}")
    cfg = load_config(overrides)
    engine = Engine(cfg)
    engine.load_params()

    # Pre-compile the serving programs OUTSIDE any socket timeout: through
    # the axon relay the first compile of each sharded program can take
    # minutes (prefill, insert, generate, generate_n are four programs — a
    # lazily-compiled warmup request can exceed any sane HTTP timeout).
    t0 = time.perf_counter()
    warm_prompt = np.arange(1, prompt_len + 1, dtype=np.int32)
    prefix, _ = engine.prefill(warm_prompt, prompt_len)
    state = engine.init_decode_state()
    state = engine.insert(prefix, state, 0)
    state, _ = engine.generate(state)
    # warm EVERY fused-dispatch depth the orchestrator can pick: mixed-depth
    # dispatch clamps to powers of two <= spd, and a first-use compile
    # through the axon relay mid-run stalls the decode loop for minutes
    n = cfg.serving_steps_per_dispatch
    while n > 1:
        state, toks = engine.generate_n(state, n)
        n //= 2
    np.asarray(toks)  # host fetch: force the relay to finish
    del state, prefix
    print(f"[latency_slo] warmup compile {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    port = int(kv.get("port", "18321"))
    httpd, orch, _ = make_server(cfg, port=port, engine=engine)
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()

    # warm the jit programs through the real endpoint before timing
    def one_request(record: dict | None):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
        body = json.dumps({
            "prompt": list(range(1, prompt_len + 1)),
            "max_new_tokens": gen_tokens,
        })
        t0 = time.perf_counter()
        try:
            conn.request("POST", "/generate_stream", body,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            first = None
            n = 0
            server_error = None
            while True:
                line = resp.fp.readline()
                if not line:
                    break
                try:
                    obj = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "error" in obj:  # server-side failure, explicit
                    server_error = obj["error"]
                    break
                if first is None:
                    first = time.perf_counter()
                n += 1
            if server_error is not None:
                if record is not None:
                    record["error"] = f"server: {server_error[:120]}"
                return
        except Exception as e:  # noqa: BLE001 — a failed request is data
            if record is not None:
                record["error"] = f"{type(e).__name__}: {e}"
            return
        finally:
            conn.close()
        t1 = time.perf_counter()
        if record is None:
            return
        if first is not None and n == gen_tokens:
            record["ttfb"] = first - t0
            record["e2e"] = t1 - t0
            record["decode_tok_s"] = (n - 1) / max(t1 - first, 1e-9)
            record["tokens"] = n
        else:
            # stream closed short without an error line: server-side failure
            # that didn't surface (should not happen — the orchestrator's
            # _fail path sets req.error before the end-of-stream sentinel)
            record["error"] = f"short_stream tokens={n}"

    one_request(None)  # warmup: compiles prefill/insert/generate

    results: list[dict] = []
    threads: list[threading.Thread] = []
    rng = np.random.default_rng(0)
    t_end = time.perf_counter() + duration
    sent = 0
    while time.perf_counter() < t_end:
        rec: dict = {}
        results.append(rec)
        th = threading.Thread(target=one_request, args=(rec,), daemon=True)
        th.start()
        threads.append(th)
        sent += 1
        time.sleep(float(rng.exponential(1.0 / rate)))
    for th in threads:
        th.join(timeout=600)
    httpd.shutdown()
    orch.stop()

    done = [r for r in results if "e2e" in r]
    errors = [r["error"] for r in results if "error" in r]
    ttfb = [r["ttfb"] for r in done]
    e2e = [r["e2e"] for r in done]
    toks = [r["decode_tok_s"] for r in done]
    realtime_ok = [t >= TOKEN_HZ for t in toks]
    wall = duration + (max(e2e) if e2e else 0.0)
    from collections import Counter

    return {
        "offered_rate_rps": rate,
        "sent": sent,
        "completed": len(done),
        "error_kinds": dict(Counter(e.split(":")[0] for e in errors)),
        "error_sample": errors[:3],
        "duration_s": duration,
        "gen_tokens": gen_tokens,
        "ttfb_s": _percentiles(ttfb),
        "e2e_s": _percentiles(e2e),
        "decode_tok_s_per_stream": _percentiles(toks, (50, 5, 1)),
        "realtime_fraction": round(float(np.mean(realtime_ok)), 3) if toks else None,
        "achieved_tok_s": round(
            sum(r["tokens"] for r in done) / max(wall, 1e-9), 1
        ),
        "max_concurrency": int(cfg.per_device_batch_size * cfg.num_devices),
    }


if __name__ == "__main__":
    out = run(sys.argv[1:])
    print(json.dumps(out))
