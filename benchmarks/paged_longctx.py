"""Paged vs dense long-context serving bench (VERDICT r1 item #4).

Where paging wins on TPU: the dense decode cache allocates
slots x max_context up front — at 32k context and 16+ slots that exceeds a
v5e chip's HBM before a single token decodes. The paged cache allocates
HBM per LIVE page, so max_context stops being a memory term entirely:

    dense  KV HBM = slots * max_ctx * layers * nkv * d * 2 dtypes
    paged  KV HBM = num_pages * tokens_per_page * layers * ... (live tokens)

This bench measures, per context length (2k/8k/32k):
1. whether the dense cache even fits (it OOMs past ~8k at these slots),
2. decode step time dense (ragged v2) vs paged (paged flash-decoding
   kernel) at the same valid lengths — both scale with VALID tokens.

  python benchmarks/paged_longctx.py [slots=16] [valid=512]
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def _sync(x):
    return float(np.asarray(x).ravel()[0])


DIMS = [
    "decoder_block=tts", "vocab_size=8704",
    "base_emb_dim=2048", "base_num_query_heads=16", "base_num_kv_heads=8",
    "base_mlp_dim=6144", "base_num_decoder_layers=14", "head_dim=128",
    "serve_params_dtype=bfloat16", "scan_layers=false",
    "max_prefill_predict_length=512",
]


def bench_config(slots: int, max_ctx: int, valid: int, paged: bool) -> dict:
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine

    tpp = 128
    overrides = DIMS + [
        f"per_device_batch_size={slots}",
        f"max_target_length={max_ctx}",
        "decode_attention=ragged",
    ]
    if paged:
        # pool sized for the LIVE tokens (valid + headroom), NOT slots*ctx
        num_pages = slots * ((valid + tpp - 1) // tpp + 4) + 8
        overrides += [
            "paged_attention=true",
            f"pagedattn_tokens_per_page={tpp}",
            f"pagedattn_num_pages={num_pages}",
        ]
    cfg = load_config(overrides)
    eng = Engine(cfg)
    eng.load_params()
    state = eng.init_decode_state()
    prompt = np.arange(1, min(valid, cfg.max_prefill_predict_length) + 1,
                       dtype=np.int32)
    for s in range(slots):
        prefix, _ = eng.prefill(prompt, len(prompt))
        state = eng.insert(prefix, state, s)
    # advance every slot to `valid` so both caches hold the same live tokens
    # (in 64-step dispatches: generate_n compiles one program per n)
    n_advance = max(0, valid - len(prompt))
    while n_advance > 0:
        step = min(n_advance, 64)
        state, _ = eng.generate_n(state, step)
        n_advance -= step

    N = 16
    rng = jax.random.PRNGKey(0)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def loop(params, state):
        def body(carry, _):
            s, r = carry
            r, sub = jax.random.split(r)
            s, toks = eng._generate_impl(params, s, sub)
            return (s, r), toks[0]
        (s, _), toks = jax.lax.scan(body, (state, rng), None, length=N)
        return s, toks

    with eng.mesh:
        state, toks = loop(eng.params, state)
        _sync(toks)
        state, toks = loop(eng.params, state)
        _sync(toks)
        t0 = time.perf_counter()
        state, toks = loop(eng.params, state)
        _sync(toks)
        dt = (time.perf_counter() - t0) / N
    kv_bytes = (
        # live cache HBM
        (cfg.pagedattn_num_pages * tpp if paged else slots * max_ctx)
        * cfg.num_decoder_layers * cfg.num_kv_heads * cfg.head_dim * 2 * 2
    )
    return {"step_ms": round(dt * 1e3, 3), "kv_hbm_gb": round(kv_bytes / 1e9, 2)}


def run(argv=None) -> dict:
    kv = dict(a.split("=", 1) for a in (argv or []))
    slots = int(kv.get("slots", "16"))
    valid = int(kv.get("valid", "512"))
    import gc

    out = {"slots": slots, "valid": valid, "contexts": {}}
    for max_ctx in (2048, 8192, 32768):
        row = {}
        # paged first: a dense OOM's exception frames can pin its buffers
        # and spuriously OOM the paged attempt that follows
        for paged in (True, False):
            key = "paged" if paged else "dense"
            try:
                row[key] = bench_config(slots, max_ctx, valid, paged)
            except Exception as e:  # noqa: BLE001 — OOM is a result here
                row[key] = {"error": repr(e)[:160]}
            gc.collect()
        out["contexts"][str(max_ctx)] = row
    return out


if __name__ == "__main__":
    if os.environ.get("MTT_PLATFORM"):
        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])
    print(json.dumps(run(sys.argv[1:])))
