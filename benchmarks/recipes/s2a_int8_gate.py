"""S2A int8 quality gate: certify int8 sampling against bf16 via MCD.

VERDICT r1 item #2: the int8 S2A serving path measures ~16% faster
(PERF.md: 2.006 vs 2.381 s/pass) but was excluded from the headline bench
because its quality was unscored. This recipe closes that gap end-to-end
with trained weights:

1. train the tiny acoustic codec on synthetic speech-like waveforms
   (benchmarks/recipes/mcd_parity.py data),
2. tokenize the corpus; treat RVQ layer 0 as the "semantic" condition and
   all Q layers as the acoustic target (the S2A task shape),
3. train the tiny S2A masked-generative model on those pairs,
4. sample HELD-OUT utterances with reverse_diffusion in f32 and in int8
   (dynamic) from the SAME rng, decode both through the codec,
5. gate: MCD(int8 audio, gt) within ``margin_db`` of MCD(f32 audio, gt),
   and MCD(int8 audio, f32 audio) under the self-similarity band.

Pass -> the int8 path is certified at equal quality and benchmarks may use
it as the headline config (MTT_BENCH_S2A=int8).

  python benchmarks/recipes/s2a_int8_gate.py [codec_steps=250] [s2a_steps=400]
"""

from __future__ import annotations

import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

from benchmarks.recipes.mcd_parity import SMALL_CODEC, make_pool

Q = 4  # quantizer layers in the tiny stack
CB = 256


def train_tiny_stack(kv) -> dict:
    """Train the tiny codec + S2A on synthetic speech-like audio and prepare
    held-out sampling inputs. Shared by this gate and the schedule gate
    (benchmarks/recipes/s2a_schedule_gate.py)."""
    import jax
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.audio.acoustic import AcousticCodec
    from maxtext_indextts2_tpu.audio.s2a import S2AConfig
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.codec_train import train_acoustic_codec
    from maxtext_indextts2_tpu.train.s2a_train import train_s2a

    codec_steps = int(kv.get("codec_steps", "250"))
    s2a_steps = int(kv.get("s2a_steps", "200"))
    # codec=med: the round-5 quality-gate scaling (VERDICT r4 item #4) —
    # the small codec plateaus at ~20 dB reconstruction MCD; the medium one
    # (4x the channel widths) trained longer approaches the self-similarity
    # band, making the downstream e2e/oracle comparison meaningful.
    codec_kwargs = dict(SMALL_CODEC)
    if kv.get("codec") == "med":
        codec_kwargs = dict(d_model=48, latent_dim=96, vocos_dim=192,
                            vocos_intermediate_dim=512, vocos_num_layers=6)
    elif kv.get("codec") == "big":
        # round-5 scaling: med@2000 plateaued at 21.2 dB reconstruction
        # (still near the small codec's ~20) — the bottleneck is decoder
        # capacity, not steps. big doubles every width over med.
        codec_kwargs = dict(d_model=96, latent_dim=192, vocos_dim=384,
                            vocos_intermediate_dim=1024, vocos_num_layers=8)

    # large pool: with 64 waves the tiny S2A memorizes to zero loss and the
    # int8-vs-f32 comparison degenerates to bit-identical sampling
    train_pool = make_pool(seed=7, n=int(kv.get("pool", "512")))
    holdout = make_pool(seed=991, n=4)

    # ---- 1. codec
    codec_cfg = load_config([
        f"s2a_num_quantizers={Q}", f"s2a_codebook_size={CB}",
        "per_device_batch_size=4", f"steps={codec_steps}",
        "learning_rate=3e-4", "warmup_steps_fraction=0.05", "opt_type=adamw",
        "adam_weight_decay=0.0", "metrics_file=", "enable_checkpointing=false",
    ])

    def codec_batch(step):
        rng = np.random.default_rng(1000 + step)
        return {"wav": train_pool[rng.integers(0, len(train_pool), 4)]}

    codec = AcousticCodec(num_quantizers=Q, codebook_size=CB, **codec_kwargs)
    codec_out = train_acoustic_codec(codec_cfg, codec_batch,
                                     codec_kwargs=codec_kwargs)
    codec_params = codec_out["params"]

    tokenize = jax.jit(
        lambda wav: codec.apply(codec_params, wav, method=codec.tokenize)
    )
    detok = jax.jit(
        lambda idx: codec.apply(codec_params, idx, method=codec.detokenize)
    )

    # ---- 2. corpus -> (semantic, acoustic) pairs. The semantic condition
    # is a COARSENED view of RVQ layer 0 (//4): if it were layer 0 itself
    # the task is near-deterministic and the model trains to zero loss,
    # making the int8-vs-f32 comparison trivial (observed: token agreement
    # exactly 1.0). The lossy condition leaves real sampling entropy.
    codes = np.asarray(tokenize(jnp.asarray(train_pool)))  # [Q, N, T]
    acoustic = codes.transpose(1, 2, 0).astype(np.int32)  # [N, T, Q]
    semantic = (codes[0] // 4).astype(np.int32)  # [N, T], CB//4 values
    t_frames = semantic.shape[1]

    # ---- 3. S2A
    s2a_cfg = load_config([
        f"s2a_num_quantizers={Q}", f"s2a_codebook_size={CB}",
        f"s2a_cond_codebook_size={CB}", "s2a_hidden_size=128",
        "s2a_num_layers=3", "s2a_num_heads=4",
        "per_device_batch_size=8", f"steps={s2a_steps}",
        "learning_rate=1e-3", "warmup_steps_fraction=0.05", "opt_type=adamw",
        "adam_weight_decay=0.0", "metrics_file=", "enable_checkpointing=false",
    ])

    def s2a_batch(step):
        rng = np.random.default_rng(2000 + step)
        i = rng.integers(0, len(acoustic), 8)
        return {
            "acoustic": acoustic[i],
            "semantic": semantic[i],
            "mask": np.ones((8, t_frames), np.int32),
        }

    s2a_out = train_s2a(s2a_cfg, s2a_batch)
    s2a_params = s2a_out["params"]

    base = S2AConfig(
        num_quantizers=Q, hidden_size=128, num_layers=3, num_heads=4,
        codebook_size=CB, cond_codebook_size=CB, dtype=jnp.float32,
    )

    # ---- 4. held-out sampling inputs (prompt = first quarter)
    hold_codes = np.asarray(tokenize(jnp.asarray(holdout)))  # [Q, M, T]
    p = t_frames // 4
    prompt = jnp.asarray(hold_codes.transpose(1, 2, 0)[:, :p, :], jnp.int32)
    cond = jnp.asarray(hold_codes[0] // 4, jnp.int32)  # [M, T]

    def decode(gen):  # [M, T-p, Q] + prompt -> wav
        full = np.concatenate([np.asarray(prompt), gen], axis=1)  # [M, T, Q]
        return np.asarray(detok(jnp.asarray(full.transpose(2, 0, 1))))

    # discrete-path codec reconstruction of the held-out waves (tokenize ->
    # detokenize): the codec's own ceiling, scored by the caller as
    # mcd_codec_db next to the e2e and oracle numbers
    recon_holdout = np.asarray(detok(jnp.asarray(hold_codes)))

    return dict(
        base=base, s2a_params=s2a_params, prompt=prompt, cond=cond,
        decode=decode, holdout=holdout, semantic=semantic,
        recon_holdout=recon_holdout,
        s2a_loss=float(s2a_out["loss"]), codec_loss=float(codec_out["loss"]),
    )


def run(argv=None) -> dict:
    import jax
    import jax.numpy as jnp

    from benchmarks.mcd import mcd
    from maxtext_indextts2_tpu.audio.s2a import S2AModel

    # Recorded result (2026-08-19, these defaults): token agreement 0.90
    # (real sampling entropy — s2a loss 3.18), MCD f32-vs-gt 20.64 dB,
    # int8-vs-gt 21.34 dB (+0.70), int8-vs-f32 2.18 dB (the same-utterance
    # self-similarity band is ~7.6 dB) -> int8 certified, ok=true.
    kv = dict(a.split("=", 1) for a in (argv or []))
    margin_db = float(kv.get("margin_db", "2.0"))

    stack = train_tiny_stack(kv)
    s2a_params, prompt, cond = stack["s2a_params"], stack["prompt"], stack["cond"]
    m_f32 = S2AModel(stack["base"])
    m_int8 = S2AModel(dataclasses.replace(
        stack["base"], dtype=jnp.bfloat16, int8_matmul="dynamic"
    ))
    rng = jax.random.PRNGKey(17)
    steps = (4,) * Q

    def sample(model):
        fn = jax.jit(lambda pa, c, pr, r: model.apply(
            pa, c, pr, r, method=model.reverse_diffusion, n_timesteps=steps
        ))
        return fn(s2a_params, cond, prompt, rng)  # [M, T-p, Q]

    out_f32 = np.asarray(sample(m_f32))
    out_int8 = np.asarray(sample(m_int8))
    token_agreement = float((out_f32 == out_int8).mean())

    wav_f32 = stack["decode"](out_f32)
    wav_int8 = stack["decode"](out_int8)
    holdout = stack["holdout"]
    n = min(wav_f32.shape[-1], holdout.shape[-1])
    gt = holdout[..., :n]

    mcd_f32 = float(np.mean([mcd(gt[i], wav_f32[i, :n]) for i in range(len(gt))]))
    mcd_int8 = float(np.mean([mcd(gt[i], wav_int8[i, :n]) for i in range(len(gt))]))
    mcd_cross = float(np.mean([
        mcd(wav_f32[i, :n], wav_int8[i, :n]) for i in range(len(gt))
    ]))

    return {
        "mcd_f32_vs_gt_db": round(mcd_f32, 3),
        "mcd_int8_vs_gt_db": round(mcd_int8, 3),
        "mcd_int8_vs_f32_db": round(mcd_cross, 3),
        "token_agreement": round(token_agreement, 4),
        "s2a_final_loss": round(stack["s2a_loss"], 4),
        "codec_final_loss": round(stack["codec_loss"], 4),
        # int8 must not be meaningfully worse than f32 against ground truth,
        # and the two outputs must be closer to each other than either is to
        # the ground truth (same content, numerics-level divergence only)
        "ok": bool(mcd_int8 <= mcd_f32 + margin_db and mcd_cross < mcd_f32),
    }


if __name__ == "__main__":
    out = run(sys.argv[1:])
    print(json.dumps(out))
    sys.exit(0 if out["ok"] else 1)
