"""Benchmark entry point — prints ONE JSON line.

Default benchmark (the driver's north-star metric, BASELINE.json): zero-shot
TTS serving RTF per stream, MEASURED in the closed-loop full-pipeline
harness (benchmarks/tts_capacity.py — LM decode at 128 slots with fused
admission, real front-end, certified S2A, vocoder, all contending on one
chip). vs_baseline = 0.1 / rtf (the target is RTF < 0.1/stream; >1 means
target beaten). Other modes: `MTT_BENCH=rtf_composed` (the pre-round-4
stage-composed arithmetic, also the automatic fallback), `MTT_BENCH=slo`
(open-loop poisson latency harness), `MTT_BENCH=mfu` (training MFU, 220M
LM vs the reference's 61.1% for a 16B on v5e-256 — BASELINE.md).
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

BASELINE_MFU = 0.611  # reference 16B @ v5e-256 (README.md:93)
BASELINE_RTF = 0.1  # north-star: RTF < 0.1/stream (BASELINE.md)


def main_measured():
    """Default headline: the MEASURED full-pipeline serving RTF — LM decode
    (128 slots, fused admission), real front-end, certified S2A and vocoder
    CONTENDING on one chip in the closed-loop harness
    (benchmarks/tts_capacity.py). This replaces the stage-composed
    arithmetic headline (VERDICT r2 item #1: 'make the headline a
    measurement'); the composed mode remains as MTT_BENCH=rtf_composed and
    as the fallback when the measured run fails."""
    import benchmarks.tts_capacity as cap

    on_tpu = jax.devices()[0].platform == "tpu"
    args = ["minutes=2"] if on_tpu else ["tiny=1"]
    out = cap.run(args)
    rtf = out.get("measured_rtf_per_stream")
    if not rtf:
        raise RuntimeError(f"no delivered streams: {out}")
    print(json.dumps({
        "metric": "tts_rtf_per_stream",
        "value": round(rtf, 4),
        "unit": "rtf",
        "vs_baseline": round(BASELINE_RTF / rtf, 3),
        "detail": {
            "on_tpu": on_tpu,
            "mode": "measured_closed_loop",
            # the closed-loop harness drives Engine+TTSPipeline directly
            # (no HTTP server); the open-loop serving proof lives in
            # benchmarks/results/uniserver_soak_r05.json (uniserver,
            # 100% completion at rate 2, PERF.md round-5 section)
            "server": "none (direct engine loop); see uniserver soak results",
            "per_chip_streams": out["delivered_rtf_capacity"],
            "v5e8_streams_estimate": round(out["delivered_rtf_capacity"] * 8, 1),
            **out,
        },
    }))


def main_rtf():
    import benchmarks.tts_rtf as rtf

    on_tpu = jax.devices()[0].platform == "tpu"
    if not on_tpu:
        rtf.TINY = True  # plumbing-validation sizes off-chip
    slots = 128 if on_tpu else 4  # best measured slot count (PERF.md)
    s2a_b = 8 if on_tpu else 2
    voc_b = 8 if on_tpu else 2

    lm = rtf.bench_lm_decode(slots)
    voc = rtf.bench_vocoder(voc_b)
    # headline S2A config: int8-offline + bf16-residual numerics (certified
    # by benchmarks/recipes/s2a_int8_gate.py) with the certified sampler
    # structure — minimal step schedule 6+1x11 and CFG truncation 0.5
    # (benchmarks/recipes/s2a_schedule_gate.py minimal_cfg_half; PERF.md
    # "S2A sampler-structure quality gate"). Measured 0.598 s/pass = 133.8
    # streams/chip vs 0.922/86.8 reduced (8,2x11) and 2.016/39.7 for the
    # reference schedule (s2a_structural_queue.sh).
    # MTT_BENCH_S2A=reduced keeps the prior (8,2x11)/cfg 0.5 headline;
    # =int8_full keeps int8 numerics but the reference (10,4x11)/cfg-always
    # schedule; =bf16 reverts everything to reference sampling.
    s2a_kw = dict(int8="offline", bf16_weights=True,
                  timesteps=(6,) + (1,) * 11, cfg_until=0.5)
    mode = os.environ.get("MTT_BENCH_S2A")
    if mode == "reduced":
        s2a_kw = dict(int8="offline", bf16_weights=True,
                      timesteps=(8,) + (2,) * 11, cfg_until=0.5)
    elif mode == "int8_full":
        s2a_kw = dict(int8="offline", bf16_weights=True)
    elif mode == "bf16":
        s2a_kw = {}
    s2a = rtf.bench_s2a(s2a_b, **s2a_kw)
    eff_rtf = (
        1.0 / max(lm["streams_capacity"], 1e-9)
        + 1.0 / max(s2a["streams_capacity"], 1e-9)
        + 1.0 / max(voc["streams_capacity"], 1e-9)
    )
    per_chip = min(lm["streams_capacity"], s2a["streams_capacity"],
                   voc["streams_capacity"])
    print(
        json.dumps(
            {
                "metric": "tts_rtf_per_stream",
                "value": round(eff_rtf, 4),
                "unit": "rtf",
                "vs_baseline": round(BASELINE_RTF / max(eff_rtf, 1e-9), 3),
                "detail": {
                    "on_tpu": on_tpu,
                    "lm_decode": lm,
                    "s2a": s2a,
                    "vocoder": voc,
                    "per_chip_streams": round(per_chip, 1),
                    "v5e8_streams_estimate": round(per_chip * 8, 1),
                },
            }
        )
    )


def main_slo():
    """MTT_BENCH=slo: the full-pipeline serving measurement under poisson
    /tts load (benchmarks/tts_slo.py) — text -> LM (continuous batching) ->
    batched S2A -> vocoder, all three stages CONTENDING on one chip. The
    metric is delivered RTF capacity: audio-seconds synthesized per
    wall-second at the measured operating point. vs_baseline compares
    against the 10-streams-per-chip equivalent of the RTF<0.1 north star."""
    import sys

    import benchmarks.tts_slo as tts_slo

    on_tpu = jax.devices()[0].platform == "tpu"
    args = ["rate=2", "duration=60"] if on_tpu else ["tiny=1"]
    args += [a for a in sys.argv[1:] if "=" in a]
    out = tts_slo.run(args)
    delivered = out.get("delivered_rtf_capacity") or 0.0
    print(json.dumps({
        "metric": "tts_slo_delivered_rtf_capacity",
        "value": delivered,
        "unit": "audio_seconds_per_wall_second",
        # north star RTF<0.1/stream = 10 concurrent real-time streams/chip
        "vs_baseline": round(delivered / 10.0, 3),
        "detail": out,
    }))


def main_smoke():
    """MTT_BENCH=smoke: run every Pallas kernel for real on the attached
    device and check parity vs a jnp reference (ops/smoke.py). The round's
    on-chip pre-flight — run this before any measurement session so a
    Mosaic lowering regression is caught by a named check, not by a
    mysterious mid-bench failure."""
    from maxtext_indextts2_tpu.ops import smoke

    results = smoke.run_all()
    n_ok = sum(1 for r in results if r["ok"])
    print(json.dumps({
        "metric": "pallas_smoke_pass_fraction",
        "value": round(n_ok / max(len(results), 1), 4),
        "unit": "fraction",
        "vs_baseline": 1.0 if n_ok == len(results) else 0.0,
        "detail": {
            "backend": jax.default_backend(),
            "checks": results,
        },
    }))


def main():
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
    from maxtext_indextts2_tpu.train.train import (
        batch_sharding,
        jit_train_step,
        setup_train_state,
    )
    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.utils import flops as flops_lib
    from maxtext_indextts2_tpu.utils.metrics import _chip_kind

    on_tpu = jax.devices()[0].platform == "tpu"
    n_dev = len(jax.devices())
    # 1.28B tts-1b-class model — the largest honest single-chip measurement
    # (VERDICT r1 item #1). Best measured config (PERF.md "1B MFU"):
    # batch 4, remat save_attn_and_mlp (saves the attn output + pre-wo mlp
    # activations; backward recomputes only the cheap rest), unrolled
    # layers, bf16 master weights -> 111.0 TF/s/chip = 56.4% MFU on v5e.
    cfg = load_config(
        [
            "decoder_block=tts",
            "base_emb_dim=2048",
            "base_num_query_heads=16",
            "base_num_kv_heads=8",
            "base_mlp_dim=8192",
            "base_num_decoder_layers=20",
            "head_dim=128",
            "vocab_size=8704",
            "max_target_length=2048",
            "per_device_batch_size=4" if on_tpu else "per_device_batch_size=1",
            # unrolled layers: the layer scan's carry stacking costs ~27 ms
            # of the 131 ms step (88.8 -> 111.6 TF/s measured, PERF.md) —
            # same lesson as serving decode
            "scan_layers=false",
            "remat_policy=save_attn_and_mlp",
            "weight_dtype=bfloat16",
            "cast_logits_to_fp32=false",
            "attention=flash",
            "flash_block_sizes=[1024,1024]",  # best measured (PERF.md sweep)
        ]
        + ([] if on_tpu else [
            "base_emb_dim=256", "base_mlp_dim=512", "base_num_query_heads=4",
            "base_num_kv_heads=4", "base_num_decoder_layers=2",
            "max_target_length=256",
        ])
    )
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    p_step = jit_train_step(model, cfg, mesh, shardings)
    dshard = batch_sharding(mesh)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, dshard), next(SyntheticDataIterator(cfg))
    )
    rng = jax.random.PRNGKey(1)

    import numpy as np

    def sync(x):
        # On the axon relay backend block_until_ready returns before the
        # remote computation finishes; a host fetch is the only true sync.
        return float(np.asarray(x))

    def timed(n, state):
        t0 = time.perf_counter()
        m = None
        for _ in range(n):
            state, m = p_step(state, batch, rng)
        loss = sync(m["loss"])
        return time.perf_counter() - t0, state, loss

    with mesh:
        state, metrics = p_step(state, batch, rng)  # compile + warmup
        loss = sync(metrics["loss"])
        if on_tpu:
            # slope timing: cancels the fixed ~50ms relay fetch overhead
            n1, n2 = 2, 12
            t1, state, _ = timed(n1, state)
            t2, state, loss = timed(n2, state)
            dt = (t2 - t1) / (n2 - n1)
        else:
            t1, state, loss = timed(2, state)
            dt = t1 / 2
        metrics = {"loss": loss}

    tflops = flops_lib.training_tflops_per_step(cfg)
    chip = _chip_kind()
    mfu = flops_lib.mfu(tflops, dt, n_dev, chip)
    print(
        json.dumps(
            {
                "metric": "train_mfu",
                "value": round(mfu, 4),
                "unit": "fraction_of_peak",
                "vs_baseline": round(mfu / BASELINE_MFU, 4),
                "detail": {
                    "chip": chip,
                    "n_devices": n_dev,
                    "step_time_s": round(dt, 4),
                    "tflops_per_step": round(tflops, 2),
                    "per_device_tflops_per_s": round(tflops / dt / n_dev, 2),
                    "loss": round(metrics["loss"], 4),
                },
            }
        )
    )


def _probe_device(timeout_s: int = 600) -> bool:
    # 600s: cold first-connect through the relay has been observed to take
    # 3-5 min; a tight probe here would false-negative the whole bench.
    """The fabric can wedge (observed: stuck grants after killed clients);
    probe with a trivial op under SIGALRM before committing to the bench."""
    import signal

    def _raise(*a):
        raise TimeoutError("device probe timed out")

    old = signal.signal(signal.SIGALRM, _raise)
    signal.alarm(timeout_s)
    try:
        import numpy as np

        float(np.asarray(jax.jit(lambda x: x.sum())(jnp.ones(8))))
        return True
    except Exception as e:  # noqa: BLE001
        print(
            json.dumps(
                {
                    "metric": "tts_rtf_per_stream",
                    "value": 0.0,
                    "unit": "rtf",
                    "vs_baseline": 0.0,
                    "detail": {"error": f"device unavailable: {e!r}"},
                }
            )
        )
        return False
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


if __name__ == "__main__":
    import os
    import sys

    if os.environ.get("MTT_PLATFORM"):  # sitecustomize clobbers JAX_PLATFORMS
        jax.config.update("jax_platforms", os.environ["MTT_PLATFORM"])
    if _probe_device():
        mode = os.environ.get("MTT_BENCH", "rtf")
        if mode == "mfu" or "--mfu" in sys.argv:
            main()
        elif mode == "smoke" or "--smoke" in sys.argv:
            main_smoke()
        elif mode == "slo" or "--slo" in sys.argv:
            try:
                main_slo()
            except Exception as e:  # noqa: BLE001 - always emit the JSON line
                print(json.dumps({
                    "metric": "tts_slo_delivered_rtf_capacity",
                    "value": 0.0,
                    "unit": "audio_seconds_per_wall_second",
                    "vs_baseline": 0.0,
                    "detail": {"error": repr(e)[:500]},
                }))
        elif mode == "rtf_composed":
            try:
                main_rtf()
            except Exception as e:  # noqa: BLE001 - always emit the JSON line
                print(
                    json.dumps(
                        {
                            "metric": "tts_rtf_per_stream",
                            "value": 0.0,
                            "unit": "rtf",
                            "vs_baseline": 0.0,
                            "detail": {"error": repr(e)[:500]},
                        }
                    )
                )
        else:
            # default: measured closed-loop serving RTF; stage-composed
            # arithmetic is the fallback if the measured run fails
            try:
                main_measured()
            except Exception as e:  # noqa: BLE001 — fall back, still one line
                import sys as _sys

                print(f"[bench] measured mode failed ({e!r}); "
                      "falling back to stage-composed", file=_sys.stderr)
                try:
                    main_rtf()
                except Exception as e2:  # noqa: BLE001 - always emit JSON
                    print(
                        json.dumps(
                            {
                                "metric": "tts_rtf_per_stream",
                                "value": 0.0,
                                "unit": "rtf",
                                "vs_baseline": 0.0,
                                "detail": {"error": repr(e2)[:500]},
                            }
                        )
                    )
