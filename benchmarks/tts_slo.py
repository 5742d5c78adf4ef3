"""Full-pipeline TTS latency bench: poisson /tts load against the server.

benchmarks/latency_slo.py measures the LM stage under load; this harness
drives the WHOLE text->waveform path (front-end tokenize, LM generation
through the continuous-batching orchestrator, batched masked S2A sampling,
vocoder decode) through the HTTP server's /tts endpoint with poisson
arrivals — the serving discipline the reference never had (its S2A sampler
is offline torch; reference capability anchor is the mlperf loadgen
latency discipline, inference_mlperf/offline_mode.py:541).

Model sizes: the 0.8B TTS LM from benchmarks/tts_rtf.py + the production
S2A (16L/1024h/12q) at the certified serving numerics (int8-offline +
bf16 residual, minimal schedule + cfg_until=0.5 — see PERF.md). Weights
are randomly initialized: latency/throughput under load are
shape-determined, not value-determined. The acoustic codec/front-end use
the small test sizes (the vocoder stage measures ~10k streams/chip — it
is never the constraint).

Run on-chip:   python benchmarks/tts_slo.py rate=2 duration=60
CPU plumbing:  MTT_PLATFORM=cpu python benchmarks/tts_slo.py tiny=1

Metrics: p50/p95/p99 end-to-end latency (arrival -> wav received),
completed/total, achieved audio-seconds per wall-second (serving RTF
capacity actually delivered under this arrival process), and the
batcher's mean S2A batch size (how well the window fills).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

# 0.8B TTS LM (benchmarks/latency_slo.py SERVE_CFG) + certified S2A serving
PROD_CFG = [
    "decoder_block=tts",
    "base_emb_dim=1536", "base_num_query_heads=12", "base_num_kv_heads=4",
    "base_mlp_dim=6144", "base_num_decoder_layers=14", "head_dim=128",
    # ctx 1024 holds prompt (~312) + 250 generated with headroom; halving
    # context doubles the affordable slot count at the same KV bytes —
    # 128 slots is the LM stage's measured capacity point (235 streams,
    # PERF.md "Ragged-v2"), and the LM is otherwise the tighter stage here
    "vocab_size=9344", "max_target_length=1024",
    "max_prefill_predict_length=512",
    "decode_sampling_strategy=greedy", "decode_attention=ragged",
    "serve_params_dtype=bfloat16", "scan_layers=false",
    "per_device_batch_size=128",
    # S2A: production size is the config default (16L/1024h/12q); serve the
    # certified fast structure (PERF.md "On-chip speed effect")
    "s2a_serving_dtype=int8_offline",
    "s2a_timesteps=(6,1,1,1,1,1,1,1,1,1,1,1)", "s2a_cfg_until=0.5",
    "tts_batch_max=8", "tts_batch_window_ms=200",
    # through the axon relay each host dispatch costs ~40 ms; fused depth 16
    # keeps per-stream decode above the 50 Hz token rate (PERF.md load
    # sweep). Locally-attached hosts can drop this to 4.
    "serving_steps_per_dispatch=16",
    "tts_allow_force_frames=true",
]
TINY_CFG = [
    "decoder_block=tts",
    "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
    "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
    "vocab_size=9344", "max_target_length=256",
    "max_prefill_predict_length=128",
    "decode_sampling_strategy=greedy", "scan_layers=false",
    "per_device_batch_size=4",
    "s2a_num_quantizers=4", "s2a_hidden_size=64", "s2a_num_layers=2",
    "s2a_num_heads=4", "s2a_timesteps=(2,2,2,2)", "s2a_cfg_until=0.5",
    "tts_batch_max=4", "tts_batch_window_ms=100",
    "tts_allow_force_frames=true",
]


def _percentiles(xs, ps=(50, 95, 99)):
    if not xs:
        return {f"p{p}": None for p in ps}
    return {f"p{p}": round(float(np.percentile(xs, p)), 3) for p in ps}


def run(argv=None) -> dict:
    import base64
    import http.client

    kv = dict(a.split("=", 1) for a in (argv or []))
    known = {"tiny", "rate", "rates", "duration", "gen_tokens", "prompt_s",
             "port", "lm_only", "no_http", "server_only", "client"}
    cfg_overrides = [f"{k}={v}" for k, v in kv.items() if k not in known]
    tiny = bool(int(kv.get("tiny", "0")))
    rate = float(kv.get("rate", "1" if tiny else "2"))  # requests / s
    rates = ([float(r) for r in kv["rates"].split(",")]
             if "rates" in kv else [rate])  # sweep: one server, many rates
    duration = float(kv.get("duration", "8" if tiny else "60"))
    gen_tokens = int(kv.get("gen_tokens", "8" if tiny else "250"))  # 5 s audio
    prompt_s = float(kv.get("prompt_s", "0.2" if tiny else "1.0"))

    # client=host:port — drive poisson load against an EXTERNAL serving
    # process (started with server_only=1). The last untried failure-
    # isolation axis: every failing run so far generated load from
    # in-process threads; out-of-process load leaves the serving process
    # with only its own threads (orchestrator loop, batcher, HTTP
    # handlers).
    client = kv.get("client")
    if client:
        host, port_s = client.rsplit(":", 1)
        w16 = np.zeros(int(16_000 * prompt_s), np.float32)
        w24 = np.zeros(int(24_000 * prompt_s), np.float32)
        body = {"text": "hi" if tiny else
                "benchmark sentence for the serving harness",
                "prompt_wav_16k_b64": base64.b64encode(w16.tobytes()).decode(),
                "prompt_wav_24k_b64": base64.b64encode(w24.tobytes()).decode(),
                "wav_encoding": "b64",
                "max_new_tokens": gen_tokens, "force_frames": True}
        payload = json.dumps(body).encode()

        def one_request(record):
            conn = http.client.HTTPConnection(host, int(port_s), timeout=900)
            t_arrive = time.perf_counter()
            try:
                conn.request("POST", "/tts", payload,
                             {"Content-Type": "application/json"})
                resp = conn.getresponse()
                data = json.loads(resp.read())
                if record is not None:
                    if resp.status == 200 and ("wav" in data or "wav_b64" in data):
                        record["e2e"] = time.perf_counter() - t_arrive
                        record["audio_s"] = data["info"]["audio_seconds"]
                    else:
                        record["error"] = data.get("error", f"http {resp.status}")
            except Exception as e:  # noqa: BLE001 — recorded
                if record is not None:
                    record["error"] = f"{type(e).__name__}: {e}"
            finally:
                conn.close()

        one_request(None)  # connectivity check
        outs = []
        for r in rates:
            rng = np.random.default_rng(0)
            records, threads = [], []
            t_start = time.perf_counter()
            t_next = t_start
            while t_next - t_start < duration:
                now = time.perf_counter()
                if now < t_next:
                    time.sleep(t_next - now)
                rec: dict = {}
                records.append(rec)
                th = threading.Thread(target=one_request, args=(rec,),
                                      daemon=True)
                th.start()
                threads.append(th)
                t_next += rng.exponential(1.0 / r)
            for th in threads:
                th.join(timeout=900)
            wall = time.perf_counter() - t_start
            done = [x for x in records if "e2e" in x]
            errors = [x["error"] for x in records if "error" in x]
            audio_s = sum(x["audio_s"] for x in done)
            outs.append({
                "rate_rps": r, "duration_s": duration,
                "gen_tokens": gen_tokens,
                "completed": len(done), "total": len(records),
                "error_count": len(errors), "errors": errors[:3],
                "e2e_s": _percentiles([x["e2e"] for x in done]),
                "audio_seconds_delivered": round(audio_s, 1),
                "delivered_rtf_capacity": round(audio_s / wall, 2),
                "out_of_process_client": True,
            })
            print(f"[tts_slo client] rate={r}: {json.dumps(outs[-1])}",
                  file=sys.stderr)
        return outs[0] if len(outs) == 1 else {"sweep": outs}

    from maxtext_indextts2_tpu.audio.pipeline import build_tiny_pipeline
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.server import make_server

    lm_only = bool(int(kv.get("lm_only", "0")))  # isolation: no S2A/vocoder
    cfg = load_config(list(TINY_CFG if tiny else PROD_CFG) + cfg_overrides)
    pipeline = build_tiny_pipeline(cfg)
    if lm_only:
        # diagnosis mode: the S2A+vocoder stage becomes host-side silence of
        # the right length — same request flow, LM the only device user
        hop = 1200

        def fake_s2a(requests, sems, acs, gens, pad_to_batch=None, **kw):
            return [
                (np.zeros(len(g) * hop, np.float32),
                 {"audio_seconds": len(g) * hop / 24_000.0,
                  "semantic_tokens": len(g), "batch": len(requests)})
                for g in gens
            ]

        def fake_frontend(requests, pad_to_batch=None):
            return ([np.zeros(8, np.int64)] * len(requests),
                    [np.zeros((8, pipeline.s2a.cfg.num_quantizers), np.int32)]
                    * len(requests))

        pipeline.s2a_vocoder_batch = fake_s2a
        pipeline.frontend_batch = fake_frontend

    # Warm every program OUTSIDE request timeouts (through the axon relay
    # the S2A sampler compile alone can take minutes). One padded
    # synthesize_batch call compiles the exact shapes serving will use —
    # pad_to_batch means the batch dim never re-compiles.
    w16 = np.zeros(int(16_000 * prompt_s), np.float32)
    w24 = np.zeros(int(24_000 * prompt_s), np.float32)
    # force_frames: every stream carries its full frame budget (random LM
    # weights would otherwise emit a terminating id within a few tokens and
    # the measured load would be a fraction of the offered one)
    body = {"text": "hi" if tiny else "benchmark sentence for the serving harness",
            # binary prompt upload + binary wav response: a JSON float list
            # for a 5 s/24 kHz wav holds the GIL ~100x longer to encode and
            # parse, which starves the serving threads (decode_soak gil mode)
            "prompt_wav_16k_b64": base64.b64encode(w16.tobytes()).decode(),
            "prompt_wav_24k_b64": base64.b64encode(w24.tobytes()).decode(),
            "wav_encoding": "b64",
            "max_new_tokens": gen_tokens, "force_frames": True}
    t0 = time.perf_counter()
    # warm the frontend and S2A/vocoder shapes WITHOUT the single-stream LM
    # path: loaded-program space on the chip is a real resource (observed
    # relay 'TPU backend error' on later program loads once too many
    # executables accumulated) — serving's LM programs are the
    # orchestrator's, warmed by the /tts request below, and the
    # generate_stream path must not load its own
    warm_body = dict(body, prompt_wav_16k=w16, prompt_wav_24k=w24)
    # pad_to_batch matches the serving batcher's frontend shape — the warm
    # compile here IS the executable serving will run
    sems, acs = pipeline.frontend_batch([warm_body],
                                        pad_to_batch=cfg.tts_batch_max)
    fake_gens = [[1] * gen_tokens]
    pipeline.s2a_vocoder_batch([warm_body], sems, acs, fake_gens,
                               pad_to_batch=cfg.tts_batch_max)
    print(f"[tts_slo] warmup compile {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    port = int(kv.get("port", "18423"))
    httpd, orch, batcher = make_server(cfg, port=port, tts_pipeline=pipeline)
    server_thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    server_thread.start()
    # one request through the real endpoint warms the orchestrator-backed
    # LM path (generate_fn) before timing
    payload = json.dumps(body).encode()

    no_http = bool(int(kv.get("no_http", "0")))  # fault isolation: drive the
    # batcher directly — same workload, no sockets/handler threads

    def one_request_direct(record: dict | None):
        t_arrive = time.perf_counter()
        req = batcher.submit(dict(body, prompt_wav_16k=w16, prompt_wav_24k=w24))
        ok = req.done.wait(timeout=870)
        if record is not None:
            if ok and req.error is None and req.result is not None:
                wav, info = req.result
                record["e2e"] = time.perf_counter() - t_arrive
                record["audio_s"] = info["audio_seconds"]
            else:
                record["error"] = req.error or ("timed out" if not ok else "no result")

    def one_request_http(record: dict | None):
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=900)
        t_arrive = time.perf_counter()
        try:
            conn.request("POST", "/tts", payload,
                         {"Content-Type": "application/json"})
            resp = conn.getresponse()
            data = json.loads(resp.read())
            if record is not None:
                if resp.status == 200 and ("wav" in data or "wav_b64" in data):
                    record["e2e"] = time.perf_counter() - t_arrive
                    record["audio_s"] = data["info"]["audio_seconds"]
                else:
                    record["error"] = data.get("error", f"http {resp.status}")
        except Exception as e:  # noqa: BLE001 — recorded as a failure
            if record is not None:
                record["error"] = f"{type(e).__name__}: {e}"
        finally:
            conn.close()

    one_request = one_request_direct if no_http else one_request_http
    one_request(None)  # endpoint warm (orchestrator LM path)

    if int(kv.get("server_only", "0")):
        # hold the warm server for an out-of-process load generator
        # (client=host:port mode); runs until the process is killed
        print(f"[tts_slo] READY port={port}", file=sys.stderr, flush=True)
        try:
            while True:
                time.sleep(60)
        except KeyboardInterrupt:
            pass
        httpd.shutdown()
        batcher.stop()
        orch.stop()
        return {"server_only": True, "port": port}

    def measure(rate: float) -> dict:
        """One poisson arrival process at ``rate`` against the warm server."""
        b0, r0 = batcher.batches, batcher.requests
        rng = np.random.default_rng(0)
        records: list[dict] = []
        threads: list[threading.Thread] = []
        t_start = time.perf_counter()
        t_next = t_start
        while t_next - t_start < duration:
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            rec: dict = {}
            records.append(rec)
            th = threading.Thread(target=one_request, args=(rec,), daemon=True)
            th.start()
            threads.append(th)
            t_next += rng.exponential(1.0 / rate)
        for th in threads:
            th.join(timeout=900)
        wall = time.perf_counter() - t_start

        done = [r for r in records if "e2e" in r]
        errors = [r["error"] for r in records if "error" in r]
        audio_s = sum(r["audio_s"] for r in done)
        nb = max(batcher.batches - b0, 1)
        return {
            "rate_rps": rate,
            "duration_s": duration,
            "gen_tokens": gen_tokens,
            "completed": len(done),
            "total": len(records),
            "error_count": len(errors),
            "errors": errors[:3],
            "decode_recoveries": orch.stats.get("decode_recoveries", 0),
            "decode_failures": orch.stats.get("decode_failures", 0),
            "prefill_refreshes": orch.stats.get("prefill_refreshes", 0),
            "e2e_s": _percentiles([r["e2e"] for r in done]),
            "audio_seconds_delivered": round(audio_s, 1),
            "delivered_rtf_capacity": round(audio_s / wall, 2),
            "s2a_batches": batcher.batches - b0,
            "mean_s2a_batch": round((batcher.requests - r0) / nb, 2),
        }

    def _mem() -> dict:
        try:
            import jax

            s = jax.local_devices()[0].memory_stats() or {}
            return {k: s[k] for k in ("bytes_in_use", "peak_bytes_in_use")
                    if k in s}
        except Exception:  # noqa: BLE001 — stats are best-effort
            return {}

    outs = []
    for r in rates:
        outs.append(measure(r))
        outs[-1]["device_memory"] = _mem()
        print(f"[tts_slo] rate={r}: {json.dumps(outs[-1])}", file=sys.stderr)
    out = outs[0] if len(outs) == 1 else {"sweep": outs}
    httpd.shutdown()
    batcher.stop()
    orch.stop()
    return out


if __name__ == "__main__":
    if os.environ.get("MTT_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])
    print(json.dumps(run(sys.argv[1:])))
