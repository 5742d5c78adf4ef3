"""MoE expert-matmul kernel decision bench (VERDICT r1 item #5).

Measures the grouped expert matmul at qwen3-30b-a3b shapes (128 experts,
top-8 routing, d=2048, f=768 — configs/models/qwen3-30b-a3b.yml) on-chip
with DEVICE-SIDE loop timing (host slope timing measured 4.35 ms for a
0.80 ms op through the relay — sub-ms programs need an in-jit lax.scan).

Variants:
1. ``jax.lax.ragged_dot`` bf16 (the moe.py sparse path's primitive),
2. capacity-style batched matmul [E,C,d]x[E,d,f] (GShard-class routing),
3. gather + bmm + scatter (the full capacity round trip),
4. int8 x int8 ragged_dot (quantized experts),
5. dense one-hot fallback.

Decision record (2026-08-19, v5e single chip): ragged_dot bf16 runs at
64.3 TF/s = 63% of the 402 MB weight-streaming roofline (~103 TF/s ceiling
at these shapes) and exactly matches the raw batched matmul (66.5) — the
gather/scatter around ANY dropless design costs more than the matmul gap.
An in-house Pallas gmm could buy at most ~30% on the matmul alone; XLA's
primitive is the right call. (Reference carries an 825-LoC megablox gmm:
MaxText/kernels/megablox/gmm.py.)

  python benchmarks/moe_gmm.py [tokens=16384] [experts=128] [d=2048] [f=768]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N_LOOP = 32


def devloop_time(body, *args):
    """Seconds/iter for N_LOOP in-jit iterations (lax.scan; the carry sum
    keeps every iteration live)."""

    @jax.jit
    def run(*a):
        def step(carry, i):
            return carry + body(*a, i), None

        tot, _ = jax.lax.scan(step, jnp.zeros((), jnp.float32), jnp.arange(N_LOOP))
        return tot

    float(np.asarray(run(*args)))  # compile + warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(np.asarray(run(*args)))
        best = min(best, time.perf_counter() - t0)
    return best / N_LOOP


def run(argv=None) -> dict:
    kv = dict(a.split("=", 1) for a in (argv or []))
    on_tpu = jax.devices()[0].platform == "tpu"
    t = int(kv.get("tokens", "16384" if on_tpu else "512"))
    e = int(kv.get("experts", "128" if on_tpu else "8"))
    d = int(kv.get("d", "2048" if on_tpu else "128"))
    f = int(kv.get("f", "768" if on_tpu else "64"))
    c = t // e

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(t, d)), jnp.bfloat16)
    xe = jnp.asarray(rng.normal(size=(e, c, d)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(size=(e, d, f)), jnp.bfloat16)
    idx = jnp.asarray(rng.permutation(t).reshape(e, c), jnp.int32)
    gs = jnp.full((e,), c, jnp.int32)
    flops = 2.0 * t * d * f
    weight_bytes = e * d * f * 2

    def ragged_body(x, w, gs, i):
        o = jax.lax.ragged_dot(x, w, gs, preferred_element_type=jnp.bfloat16)
        return jnp.sum(o.astype(jnp.float32)) + i

    def bmm_body(xe, w, i):
        o = jnp.einsum("ecd,edf->ecf", xe, w, preferred_element_type=jnp.float32)
        return jnp.sum(o) + i

    def cap_body(x, w, idx, i):
        g = x[(idx.reshape(-1) + i) % x.shape[0]].reshape(e, c, d)
        o = jnp.einsum("ecd,edf->ecf", g, w, preferred_element_type=jnp.bfloat16)
        out = jnp.zeros((x.shape[0], o.shape[-1]), jnp.bfloat16)
        out = out.at[idx.reshape(-1)].set(o.reshape(-1, o.shape[-1]))
        return jnp.sum(out.astype(jnp.float32))

    results = {}
    for name, body, args in (
        ("ragged_dot_bf16", ragged_body, (x, w, gs)),
        ("capacity_bmm_only", bmm_body, (xe, w)),
        ("capacity_gather_bmm_scatter", cap_body, (x, w, idx)),
    ):
        dt = devloop_time(body, *args)
        results[name] = {"ms": round(dt * 1e3, 3),
                         "tflops": round(flops / dt / 1e12, 2)}

    # int8 x int8 experts (quantized expert matmul)
    xq = jnp.asarray(rng.integers(-127, 127, (t, d)), jnp.int8)
    wq = jnp.asarray(rng.integers(-127, 127, (e, d, f)), jnp.int8)
    try:
        def ragged_i8_body(xq, wq, gs, i):
            o = jax.lax.ragged_dot(xq, wq, gs, preferred_element_type=jnp.int32)
            return jnp.sum(o).astype(jnp.float32) + i

        dt = devloop_time(ragged_i8_body, xq, wq, gs)
        results["ragged_dot_int8"] = {"ms": round(dt * 1e3, 3),
                                      "tflops": round(flops / dt / 1e12, 2)}
    except Exception as err:  # noqa: BLE001 — lowering may reject int8
        results["ragged_dot_int8"] = {"error": repr(err)[:200]}

    return {
        "shape": {"tokens": t, "experts": e, "d": d, "f": f, "capacity": c},
        "on_tpu": on_tpu,
        "flops_per_call_g": round(flops / 1e9, 2),
        "weight_stream_roofline_tflops": round(
            flops / (weight_bytes / 819e9) / 1e12, 1
        ),
        "results": results,
    }


if __name__ == "__main__":
    if os.environ.get("MTT_PLATFORM"):  # sitecustomize pins JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])
    print(json.dumps(run(sys.argv[1:])))
