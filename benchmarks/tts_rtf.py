"""TTS serving capacity benchmark: RTF + concurrent streams.

North-star targets (BASELINE.md): RTF < 0.1 per stream and >100 concurrent
zero-shot TTS streams on v5e-8. This measures the three pipeline stages on
the attached chip(s) at serving batch sizes and derives:

- LM stage: semantic tokens are 50 Hz; a decode step serves every slot, so
  stream capacity = slots / (50 * step_time).
- S2A stage: one jitted reverse-diffusion pass generates a whole utterance;
  capacity = batch * utterance_seconds / pass_time.
- Vocoder stage: same accounting on codec decode.

Prints one JSON document with per-stage and end-to-end numbers, scaled to a
v5e-8 (x num_chips_target).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

TOKEN_RATE_HZ = 50.0  # semantic + acoustic tokens per second of audio


def _sync(x):
    return float(np.asarray(x).ravel()[0])


def time_fn(fn, n1=2, n2=8):
    """Slope timing (cancels the relay's fixed host-fetch overhead)."""
    _sync(fn())  # compile/warm
    _sync(fn())  # call 2 can recompile (donation layout); warm it too
    t0 = time.perf_counter()
    for _ in range(n1):
        r = fn()
    _sync(r)
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(n2):
        r = fn()
    _sync(r)
    t2 = time.perf_counter() - t0
    return max((t2 - t1) / (n2 - n1), 1e-6)


TINY = False  # --tiny: shrink all stages for plumbing validation on CPU


def bench_lm_decode(slots: int, decode_attention: str = "ragged",
                    extra: tuple = ()) -> dict:
    import functools

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine

    dims = (
        ["base_emb_dim=128", "base_num_query_heads=4", "base_num_kv_heads=2",
         "base_mlp_dim=256", "base_num_decoder_layers=2", "head_dim=32",
         "max_target_length=128", "max_prefill_predict_length=64"]
        if TINY else
        ["base_emb_dim=2048", "base_num_query_heads=16", "base_num_kv_heads=8",
         "base_mlp_dim=6144", "base_num_decoder_layers=14", "head_dim=128",
         "max_target_length=2048", "max_prefill_predict_length=512"]
    )
    cfg = load_config([
        "decoder_block=tts", "vocab_size=8704",
        f"per_device_batch_size={slots}",
        "attention=dot_product",
        f"decode_attention={decode_attention}",
        # bf16 weights: serving never needs the f32 checkpoint copy, and at
        # 32+ slots the f32 weights + undonated cache OOM a 16GB chip
        "serve_params_dtype=bfloat16",
    ] + dims + list(extra))
    eng = Engine(cfg)
    eng.load_params()
    state = eng.init_decode_state()
    # every slot active at a mid-stream context (512 of 2048): the ragged
    # kernel's cost scales with VALID length, so short prompts would flatter
    # it; 512 ~= a 150-token prompt + mid-utterance position
    plen = 64 if TINY else 512
    prompt = np.arange(1, plen + 1, dtype=np.int32)
    for s in range(slots):
        prefix, _ = eng.prefill(prompt, len(prompt))
        state = eng.insert(prefix, state, s)

    # N decode steps inside ONE jit: measures the device step time the way a
    # locally-attached serving host would see it (the relay adds ~20ms of
    # per-dispatch overhead that is not the hardware's cost). State is
    # donated so the KV cache isn't double-buffered (OOM at 32+ slots).
    N = 32
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
        # chain the donated state; warm twice (first re-call can recompile
        # for the donated-buffer layout)
        state, toks = loop(eng.params, state)
        _sync(toks)
        state, toks = loop(eng.params, state)
        _sync(toks)
        t0 = time.perf_counter()
        state, toks = loop(eng.params, state)
        _sync(toks)
        dt = (time.perf_counter() - t0) / N
        # per-dispatch (host-controlled) step for comparison
        state, _ = eng.generate(state)
        t0 = time.perf_counter()
        for _ in range(4):
            state, tk = eng.generate(state)
        _sync(tk)
        dt_host = (time.perf_counter() - t0) / 4

    return {
        "slots": slots,
        "step_ms_device": round(dt * 1e3, 3),
        "step_ms_host_dispatch": round(dt_host * 1e3, 3),
        "streams_capacity": round(slots / (TOKEN_RATE_HZ * dt), 2),
    }


def bench_s2a(batch: int, seconds: float = 10.0, int8=False,
              bf16_weights: bool = False,
              timesteps: tuple[int, ...] | None = None,
              cfg_until: float = 1.0) -> dict:
    """int8: False | "dynamic" | "offline" (see S2AConfig.int8_matmul).
    bf16_weights: serve-time cast_denoiser_params (bf16 residual stream).
    timesteps: per-quantizer-layer step schedule override (quality/speed
    lever; default is the reference schedule (10, 4*11)).
    cfg_until: CFG truncation fraction (uncond calls only on the first
    ceil(cfg_until*steps) steps per layer; 1.0 = reference behavior)."""
    from maxtext_indextts2_tpu.audio.s2a import (
        S2AConfig, S2AModel, cast_denoiser_params, quantize_s2a_params,
    )

    if TINY:
        seconds = 0.5
    t = int(seconds * TOKEN_RATE_HZ)
    p = 10 if TINY else 150  # 3s prompt (tiny: token-scale smoke)
    if TINY:
        cfg = S2AConfig(num_quantizers=4, hidden_size=64, num_layers=2,
                        num_heads=4, codebook_size=64, cond_codebook_size=256,
                        dtype=jnp.float32, int8_matmul=int8)
        timesteps = (2, 2, 2, 2)
    else:
        cfg = S2AConfig(num_quantizers=12, hidden_size=1024, num_layers=16,
                        num_heads=16, codebook_size=1024, cond_codebook_size=8192,
                        dtype=jnp.bfloat16, int8_matmul=int8)
        if timesteps is None:
            timesteps = (10,) + (4,) * 11
        assert len(timesteps) == 12, "full-size S2A has 12 quantizer layers"
    nq = cfg.num_quantizers
    model = S2AModel(cfg)
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.randint(rng, (batch, p + t, nq), 0, cfg.codebook_size)
    cond = jax.random.randint(rng, (batch, p + t), 0, cfg.cond_codebook_size)
    xm = jnp.ones((batch, p + t), jnp.int32)
    if int8 == "offline":
        import dataclasses

        f32_params = S2AModel(
            dataclasses.replace(cfg, int8_matmul=False)
        ).init(rng, x0, xm, cond, rng)
        params = jax.jit(
            lambda pr: quantize_s2a_params(pr, model, (x0, xm, cond, rng))
        )(f32_params)
    else:
        params = model.init(rng, x0, xm, cond, rng)
    if bf16_weights:
        params = jax.jit(cast_denoiser_params)(params)
    prompt = x0[:, :p, :]

    # pass EVERY device array as an argument: captured constants are fetched
    # host-side during lowering (catastrophic through the relay)
    f = jax.jit(lambda pr, c, pm, r: model.apply(
        pr, c, pm, r, method=model.reverse_diffusion,
        n_timesteps=timesteps, cfg=1.0, cfg_until=cfg_until,
    ))
    dt = time_fn(lambda: f(params, cond, prompt, rng), n1=1, n2=3)
    return {
        "batch": batch,
        "utterance_s": seconds,
        "timesteps": list(timesteps),
        "cfg_until": cfg_until,
        "pass_s": round(dt, 3),
        "streams_capacity": round(batch * seconds / dt, 2),
        "rtf_per_utterance": round(dt / seconds / batch, 4),
    }


def bench_vocoder(batch: int, seconds: float = 10.0) -> dict:
    from maxtext_indextts2_tpu.audio.acoustic import CodecDecoder

    if TINY:
        seconds = 0.5
    t = int(seconds * TOKEN_RATE_HZ)
    dec = CodecDecoder()
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (batch, t, 256), jnp.float32)
    params = dec.init(rng, latents)
    f = jax.jit(lambda p, x: dec.apply(p, x, method=dec.decode))
    dt = time_fn(lambda: f(params, latents), n1=6, n2=30)
    return {
        "batch": batch,
        "pass_s": round(dt, 3),
        "streams_capacity": round(batch * seconds / dt, 2),
    }


def main():
    global TINY
    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="shrink all stages (CPU plumbing validation)")
    ap.add_argument("--slots", type=int, default=128)  # best measured (PERF.md; 160 OOMs)
    ap.add_argument("--s2a_batch", type=int, default=8)
    ap.add_argument("--s2a_dtype", default="",
                    choices=["", "int8", "int8_offline"],
                    help="S2A matmul mode ('' = bf16)")
    ap.add_argument("--s2a_bf16_weights", action="store_true",
                    help="pre-cast denoiser params to bf16 (cast_denoiser_params)")
    ap.add_argument("--s2a_timesteps", default="",
                    help="comma list, e.g. 8,2,2,2,2,2,2,2,2,2,2,2 (speed/quality lever)")
    ap.add_argument("--s2a_cfg_until", type=float, default=1.0,
                    help="CFG truncation fraction (quality/speed lever; gate "
                         "via benchmarks/recipes/s2a_schedule_gate.py)")
    ap.add_argument("--voc_batch", type=int, default=8)
    ap.add_argument("--target_chips", type=int, default=8)  # v5e-8
    args = ap.parse_args()
    TINY = args.tiny

    print("benching lm decode...", flush=True)
    lm = bench_lm_decode(args.slots)
    print(json.dumps(lm), flush=True)
    print("benching vocoder...", flush=True)
    voc = bench_vocoder(args.voc_batch)
    print(json.dumps(voc), flush=True)
    print("benching s2a...", flush=True)
    int8 = {"": False, "int8": "dynamic", "int8_offline": "offline"}[args.s2a_dtype]
    ts = (tuple(int(x) for x in args.s2a_timesteps.split(","))
          if args.s2a_timesteps else None)
    s2a = bench_s2a(args.s2a_batch, int8=int8,
                    bf16_weights=args.s2a_bf16_weights, timesteps=ts,
                    cfg_until=args.s2a_cfg_until)
    print(json.dumps(s2a), flush=True)

    per_chip = min(lm["streams_capacity"], s2a["streams_capacity"],
                   voc["streams_capacity"])
    # a stream needs all three stages; assume dedicated-stage scheduling
    rtf = (1.0 / max(lm["streams_capacity"], 1e-9)
           + 1.0 / max(s2a["streams_capacity"], 1e-9)
           + 1.0 / max(voc["streams_capacity"], 1e-9))
    print(json.dumps({
        "lm_decode": lm,
        "s2a": s2a,
        "vocoder": voc,
        "per_chip_streams": round(per_chip, 1),
        "effective_rtf_per_stream": round(rtf, 4),
        "v5e8_streams_estimate": round(per_chip * args.target_chips, 1),
    }, indent=1))


if __name__ == "__main__":
    main()
