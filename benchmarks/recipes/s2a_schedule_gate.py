"""S2A sampler-schedule quality gate: certify speed/quality configs via MCD.

VERDICT r1 item #2 asked for "S2A >= 60 streams/chip with a recorded quality
gate". The remaining S2A levers after the single-op work are STRUCTURAL —
the per-layer step schedule and the number of classifier-free-guidance
(uncond) denoiser calls. Both trade sampler compute for potential quality,
so neither may become a serving default without a recorded gate.

This recipe reuses the trained tiny codec+S2A stack from
benchmarks/recipes/s2a_int8_gate.py (synthetic speech-like corpus, held-out
utterances) and scores candidate sampler configs end-to-end:

  full        int8-dynamic, full step schedule, full CFG   (certified r2)
  reduced     int8-dynamic, ~half steps per layer
  cfg_half    int8-dynamic, full steps, cfg_until=0.5 (uncond calls only on
              the first half of each layer's unmasking steps)
  reduced+cfg int8-dynamic, both

Gate per config: MCD(cand, gt) <= MCD(f32 full, gt) + margin_db AND
MCD(cand, f32 full) < MCD(f32 full, gt) (same content, divergence below the
content level). Passing configs may be served and used as bench headline.

  python benchmarks/recipes/s2a_schedule_gate.py [margin_db=2.0] [pool=512]

The full-size serving schedules these tiny-stack configs stand in for
(benchmarks/tts_rtf.py bench_s2a): reference (10,4x11) ~ "full"; (8,2x11) ~
"reduced"; cfg_until applies identically at both sizes.
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

from benchmarks.recipes.s2a_int8_gate import Q, train_tiny_stack


def run(argv=None) -> dict:
    import jax
    import jax.numpy as jnp

    from benchmarks.mcd import mcd
    from maxtext_indextts2_tpu.audio.s2a import S2AModel

    kv = dict(a.split("=", 1) for a in (argv or []))
    margin_db = float(kv.get("margin_db", "2.0"))

    stack = train_tiny_stack(kv)
    s2a_params, prompt, cond = stack["s2a_params"], stack["prompt"], stack["cond"]
    holdout = stack["holdout"]
    m_f32 = S2AModel(stack["base"])
    m_int8 = S2AModel(dataclasses.replace(
        stack["base"], dtype=jnp.bfloat16, int8_matmul="dynamic"
    ))
    rng = jax.random.PRNGKey(17)

    # tiny-stack analogue of the serving schedules: full (4,)*Q vs ~half.
    # Layer 0 keeps more steps (the reference's 10-vs-4 asymmetry) since its
    # codes carry the most energy.
    full_steps = (4,) * Q
    reduced_steps = (3,) + (2,) * (Q - 1)
    minimal_steps = (2,) + (1,) * (Q - 1)  # serving analog ~ (5,1x11)

    def sample(model, steps, cfg_until):
        fn = jax.jit(lambda pa, c, pr, r: model.apply(
            pa, c, pr, r, method=model.reverse_diffusion,
            n_timesteps=steps, cfg_until=cfg_until,
        ))
        return np.asarray(fn(s2a_params, cond, prompt, rng))

    def score(wav, ref_wav, gt):
        n = min(wav.shape[-1], gt.shape[-1])
        vs_gt = float(np.mean([mcd(gt[i, :n], wav[i, :n]) for i in range(len(gt))]))
        vs_ref = float(np.mean([
            mcd(ref_wav[i, :n], wav[i, :n]) for i in range(len(gt))
        ]))
        return vs_gt, vs_ref

    # f32 full-schedule baseline (the quality-parity reference point)
    base_wav = stack["decode"](sample(m_f32, full_steps, 1.0))
    n = min(base_wav.shape[-1], holdout.shape[-1])
    gt = holdout[..., :n]
    mcd_base = float(np.mean([mcd(gt[i], base_wav[i, :n]) for i in range(len(gt))]))

    candidates = {
        "full": (full_steps, 1.0),
        "reduced": (reduced_steps, 1.0),
        "cfg_half": (full_steps, 0.5),
        "reduced_cfg_half": (reduced_steps, 0.5),
        # round-2 follow-ups: how far does the schedule bend before quality
        # gives? minimal ~ 2x fewer steps again; cfg_quarter keeps only the
        # first 25% of uncond calls.
        "minimal_cfg_half": (minimal_steps, 0.5),
        "reduced_cfg_quarter": (reduced_steps, 0.25),
    }
    # The first four are SERVED configs (bench.py headline lives among them):
    # the recipe's exit status gates on those. The exploratory candidates
    # report their verdicts but only become servable if they pass.
    required = {"full", "reduced", "cfg_half", "reduced_cfg_half"}
    out = {"mcd_f32_full_vs_gt_db": round(mcd_base, 3), "configs": {}}
    all_scores = []
    for name, (steps, cu) in candidates.items():
        wav = stack["decode"](sample(m_int8, steps, cu))
        vs_gt, vs_ref = score(wav, base_wav, gt)
        ok = bool(vs_gt <= mcd_base + margin_db and vs_ref < mcd_base)
        out["configs"][name] = {
            "steps": list(steps), "cfg_until": cu,
            "mcd_vs_gt_db": round(vs_gt, 3),
            "mcd_vs_f32_full_db": round(vs_ref, 3),
            "ok": ok,
        }
        if name in required:
            all_scores.append(ok)

    out["s2a_final_loss"] = round(stack["s2a_loss"], 4)
    out["codec_final_loss"] = round(stack["codec_loss"], 4)
    out["ok"] = bool(all(all_scores))
    return out


if __name__ == "__main__":
    out = run(sys.argv[1:])
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)
