"""MLPerf-style offline inference benchmark: samples/sec over a query pool.

Reference: MaxText/inference_mlperf/ (loadgen offline_mode.py:541 +
offline_inference.py:399). The loadgen protocol boils down to: issue the
whole query pool at once, the SUT batches freely, report completed
samples/sec and per-sample token counts. This harness reproduces that
contract against the OfflineEngine (continuous batching over slots) without
the loadgen dependency (not in the image).

Usage:  python benchmarks/mlperf_offline.py [num_queries=N] [max_new=N] [key=value ...]
Prints one JSON line with samples_per_second and tokens_per_second.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys
import time

import numpy as np


def run(argv=None) -> dict:
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.offline_engine import OfflineEngine

    argv = list(argv or [])
    num_queries, max_new = 16, 8
    accuracy, goldens_path = False, None
    scenario, target_qps, latency_bound = None, 2.0, 2.0
    keep = []
    for a in argv:
        if a.startswith("num_queries="):
            num_queries = int(a.split("=", 1)[1])
        elif a.startswith("max_new="):
            max_new = int(a.split("=", 1)[1])
        elif a.startswith("accuracy="):
            accuracy = bool(int(a.split("=", 1)[1]))
        elif a.startswith("goldens="):
            goldens_path, accuracy = a.split("=", 1)[1], True
        elif a.startswith("scenario="):
            scenario = a.split("=", 1)[1]
        elif a.startswith("target_qps="):
            target_qps = float(a.split("=", 1)[1])
        elif a.startswith("latency_bound="):
            latency_bound = float(a.split("=", 1)[1])
        else:
            keep.append(a)

    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=16", "per_device_batch_size=0.25",
        "decode_sampling_strategy=greedy", "dtype=float32",
    ] + keep)

    rng = np.random.default_rng(0)
    lengths = rng.integers(4, cfg.max_prefill_predict_length, size=num_queries)
    pool = [
        rng.integers(1, cfg.vocab_size, size=int(n)).astype(np.int32)
        for n in lengths
    ]

    eng = OfflineEngine(cfg)
    # warmup compiles prefill + generate
    eng.generate_batch(pool[:1], max_new)

    if scenario:
        # loadgen protocol mode (infer/loadgen.py — the in-repo counterpart
        # of reference inference_mlperf/offline_mode.py's lg.StartTest):
        # Offline issues the pool as one query; Server draws poisson
        # arrivals and judges the p99-latency SLO.
        from maxtext_indextts2_tpu.infer.loadgen import (
            OfflineEngineSUT, OrchestratorSUT, QuerySampleLibrary,
            TestSettings, run_test,
        )

        qsl = QuerySampleLibrary(pool)
        settings = TestSettings(
            scenario=scenario, target_qps=target_qps,
            min_query_count=num_queries, min_duration_s=5.0,
            server_target_latency_s=latency_bound,
        )
        orch = None
        if scenario == "server":
            from maxtext_indextts2_tpu.infer.server import Orchestrator

            orch = Orchestrator(eng.engine)
            orch.start()
            sut = OrchestratorSUT(orch, max_new).bind(qsl)
        else:
            sut = OfflineEngineSUT(eng, max_new).bind(qsl)
        lg = run_test(sut, qsl, settings)
        if orch is not None:
            orch.stop()
        print(lg.summary(), file=sys.stderr)
        return {
            "metric": f"mlperf_{scenario}_completed_qps",
            "value": round(lg.completed_qps, 3),
            "unit": "samples/s",
            "detail": {
                "valid": lg.valid,
                "issued": lg.issued,
                "completed": lg.completed,
                "scheduled_qps": round(lg.scheduled_qps, 3),
                "latency_percentiles_s": {
                    k: round(v, 4) for k, v in lg.percentiles.items()
                },
                "reasons": lg.reasons,
            },
        }

    t0 = time.perf_counter()
    outs = eng.generate_batch(pool, max_new)
    dt = time.perf_counter() - t0

    total_tokens = sum(len(o) for o in outs)
    result = {
        "metric": "mlperf_offline_samples_per_s",
        "value": round(num_queries / dt, 3),
        "unit": "samples/s",
        "detail": {
            "num_queries": num_queries,
            "max_new_tokens": max_new,
            "generated_tokens": int(total_tokens),
            "tokens_per_s": round(total_tokens / dt, 1),
            "wall_s": round(dt, 3),
        },
    }

    # Accuracy half of the MLPerf discipline (reference:
    # inference_mlperf/evaluate-accuracy.py): score the batched serving
    # path's outputs against per-query goldens. goldens=path loads a JSON
    # list; otherwise goldens are regenerated on the spot via the
    # single-stream decode path (prefill -> insert(0) -> generate loop),
    # which exercises a DIFFERENT code path (no continuous batching, no
    # slot multiplexing) over the same weights — greedy decoding must agree
    # exactly, so rougeL/exact_match below 1.0 flags a serving-path bug.
    if accuracy:
        from maxtext_indextts2_tpu.utils.accuracy_eval import evaluate_outputs

        if goldens_path:
            with open(goldens_path) as f:
                goldens = json.load(f)
        else:
            goldens = [eng.engine.generate_stream(p, max_new) for p in pool]
        result["accuracy"] = evaluate_outputs(outs, goldens)
    return result


if __name__ == "__main__":
    print(json.dumps(run(sys.argv[1:])))
