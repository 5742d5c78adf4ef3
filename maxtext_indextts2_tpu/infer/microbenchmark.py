"""Inference microbenchmark: prefill/decode latency + throughput sweep.

Reference: MaxText/inference_microbenchmark.py (:440) + _sweep.py. Prints one
JSON document with per-bucket prefill latency and AR step stats. Timing uses
host-fetch sync (block_until_ready is unreliable on the axon relay).

Run: ``python -m maxtext_indextts2_tpu.infer.microbenchmark <cfg.yml> ...``
"""

from __future__ import annotations

import json
import time

import numpy as np

from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.infer.engine import Engine


def _sync(x):
    return np.asarray(x)


def run_microbenchmark(cfg: Config, engine: Engine | None = None, iters: int = 8) -> dict:
    engine = engine or Engine(cfg)
    if engine.params is None:
        engine.load_params()

    results: dict = {"prefill_ms": {}, "decode": {}}
    rng = np.random.default_rng(0)

    # ---- prefill latency per bucket
    for plen in cfg.inference_microbenchmark_prefill_lengths:
        if plen > cfg.max_prefill_predict_length:
            continue
        prompt = rng.integers(1, cfg.vocab_size, size=plen).astype(np.int32)
        prefix, first = engine.prefill(prompt, plen)  # compile
        _sync(first)
        t0 = time.perf_counter()
        for _ in range(iters):
            prefix, first = engine.prefill(prompt, plen)
        _sync(first)
        dt = (time.perf_counter() - t0) / iters
        results["prefill_ms"][str(plen)] = round(dt * 1e3, 3)

    # ---- decode throughput with full slots
    state = engine.init_decode_state()
    plen = min(cfg.inference_microbenchmark_prefill_lengths[0],
               cfg.max_prefill_predict_length)
    prompt = rng.integers(1, cfg.vocab_size, size=plen).astype(np.int32)
    for slot in range(engine.num_slots):
        prefix, _ = engine.prefill(prompt, plen)
        state = engine.insert(prefix, state, slot)
    # device-side scan loop (generate_n) so per-dispatch host overhead is
    # excluded; slope between n=4 and n=20 cancels the fixed fetch cost.
    state, toks = engine.generate_n(state, 4)  # compile n=4
    _sync(toks)
    t0 = time.perf_counter()
    state, toks = engine.generate_n(state, 4)
    _sync(toks)
    t_short = time.perf_counter() - t0
    state, toks = engine.generate_n(state, 20)  # compile n=20
    _sync(toks)
    t0 = time.perf_counter()
    state, toks = engine.generate_n(state, 20)
    _sync(toks)
    t_long = time.perf_counter() - t0
    dt = max((t_long - t_short) / 16, 1e-6)
    results["decode"] = {
        "slots": engine.num_slots,
        "step_ms": round(dt * 1e3, 3),
        "tokens_per_s": round(engine.num_slots / dt, 1),
        "per_stream_tokens_per_s": round(1.0 / dt, 1),
    }

    # ---- chunked prefill: long prompt split into bucket-sized chunks
    # (reference: MaxText/benchmark_chunked_prefill.py)
    chunk = cfg.max_prefill_predict_length
    long_len = min(chunk * 2, cfg.max_target_length - 8)
    if long_len > chunk:
        prompt = rng.integers(1, cfg.vocab_size, size=long_len).astype(np.int32)
        prefix, first = engine.prefill_chunked(prompt, long_len, chunk)  # compile
        _sync(first)
        t0 = time.perf_counter()
        for _ in range(max(iters // 2, 1)):
            prefix, first = engine.prefill_chunked(prompt, long_len, chunk)
        _sync(first)
        dt = (time.perf_counter() - t0) / max(iters // 2, 1)
        results["chunked_prefill_ms"] = {
            "prompt_len": int(long_len),
            "chunk": int(chunk),
            "total_ms": round(dt * 1e3, 3),
        }
    return results


def main(argv=None):
    import sys

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    print(json.dumps(run_microbenchmark(cfg)))


if __name__ == "__main__":
    main()
