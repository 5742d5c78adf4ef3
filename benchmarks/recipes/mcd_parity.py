"""MCD parity recipe: train the acoustic codec, reconstruct, gate on MCD.

Closes the BASELINE.md "MCD parity" loop end-to-end (VERDICT round-1 item
#3): the converters' math being parity-tested (tests/test_torch_ckpt.py)
proves the modules, not the audio — this recipe proves the audio path by
training the codec on structured synthetic speech-like waveforms,
reconstructing a HELD-OUT set through quantize->decode, and asserting the
mel-cepstral distortion both beats the untrained anchor by a wide margin
and lands under an absolute bar.

Reference pipeline being matched: maskgct/acoustic/codec.py encode ->
RVQ -> vocos decode (full_inference.py:148-198).

  python benchmarks/recipes/mcd_parity.py            # CI-sized pass
  python benchmarks/recipes/mcd_parity.py steps=800  # closer to converged
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

SR = 24000
SECONDS = 0.5
T = int(SR * SECONDS)  # 12000 = 25 codec frames at hop 480

# CPU-trainable codec: same topology as the real one (strides 3/4/5/8,
# ISTFT head n_fft 1920 hop 480), shrunk widths.
SMALL_CODEC = dict(
    d_model=32,
    latent_dim=64,
    vocos_dim=128,
    vocos_intermediate_dim=256,
    vocos_num_layers=4,
)


def speechlike_wave(rng: np.random.Generator) -> np.ndarray:
    """Harmonic stack with a gliding f0 and a slow amplitude envelope —
    structured enough to be learnable, varied enough to have a held-out set."""
    t = np.arange(T) / SR
    f0 = rng.uniform(90.0, 260.0)
    glide = rng.uniform(-0.15, 0.15)
    phase = 2 * np.pi * (f0 * t + 0.5 * glide * f0 * t * t)
    wav = np.zeros(T, np.float64)
    for h in range(1, 9):
        amp = rng.uniform(0.6, 1.0) / (h ** 1.2)
        wav += amp * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
    env_hz = rng.uniform(1.5, 4.0)
    env = 0.55 + 0.45 * np.sin(2 * np.pi * env_hz * t + rng.uniform(0, 2 * np.pi))
    wav = wav * env
    wav = 0.3 * wav / np.max(np.abs(wav))
    # broadband noise bed (~-20 dB): pure harmonic stacks leave inter-harmonic
    # mel bins at the log floor, which makes MCD explode into the 100s dB for
    # ANY reconstruction — real speech is broadband, so make the data match
    wav = wav + 0.03 * rng.standard_normal(T)
    return wav.astype(np.float32)


def make_pool(seed: int, n: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return np.stack([speechlike_wave(rng) for _ in range(n)])


def run(argv=None) -> dict:
    import jax
    import jax.numpy as jnp

    from benchmarks.mcd import mcd
    from maxtext_indextts2_tpu.audio.acoustic import AcousticCodec
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.codec_train import train_acoustic_codec

    cfg = load_config([
        "s2a_num_quantizers=4", "s2a_codebook_size=256",
        "per_device_batch_size=4",  # single-device codec training
        "steps=300", "learning_rate=3e-4", "warmup_steps_fraction=0.05",
        "opt_type=adamw", "adam_weight_decay=0.0",
        "metrics_file=", "enable_checkpointing=false",
    ] + list(argv or []))

    train_pool = make_pool(seed=7, n=64)
    holdout = make_pool(seed=991, n=8)

    def batch_fn(step):
        rng = np.random.default_rng(1000 + step)
        idx = rng.integers(0, len(train_pool), max(1, cfg.global_batch_size_to_train_on))
        return {"wav": train_pool[idx]}

    codec = AcousticCodec(
        num_quantizers=cfg.s2a_num_quantizers,
        codebook_size=cfg.s2a_codebook_size,
        **SMALL_CODEC,
    )

    def reconstruct(params, wavs):
        # DISCRETE path: tokenize -> detokenize. The training forward's
        # straight-through output leaks continuous encoder latents and
        # flatters the metric even with a collapsed codebook; synthesis
        # only ever sees tokens (reference full_inference.py:148-198).
        idx = codec.apply(params, jnp.asarray(wavs), method=codec.tokenize)
        recon = codec.apply(params, idx, method=codec.detokenize)
        n = min(recon.shape[-1], wavs.shape[-1])
        return np.asarray(recon[..., :n], np.float32)

    untrained = codec.init(jax.random.PRNGKey(cfg.init_weights_seed),
                           jnp.asarray(holdout[:1]))
    anchor = float(np.mean([
        mcd(w, r, sr=SR) for w, r in zip(holdout, reconstruct(untrained, holdout))
    ]))

    out = train_acoustic_codec(cfg, batch_fn, codec_kwargs=SMALL_CODEC)
    recon = reconstruct(out["params"], holdout)
    trained = float(np.mean([mcd(w, r, sr=SR) for w, r in zip(holdout, recon)]))

    # Gates (calibrated 2026-08-19 on this data): untrained anchor ~33 dB,
    # MCD between two DIFFERENT waves ~26 dB, 250-step trained ~19 dB.
    # (a) training moved the needle decisively on UNSEEN audio;
    # (b) absolute bar UNDER the different-waves line — the reconstruction
    # matches its own content, not just the dataset's statistics. A
    # converged full-size codec lands far lower; this guards the path and
    # catches silent quantize/decode regressions.
    result = {
        "mcd_trained_db": round(trained, 3),
        "mcd_untrained_db": round(anchor, 3),
        "improvement": round(anchor / max(trained, 1e-9), 2),
        "steps": cfg.steps,
        "final_loss": round(float(out["loss"]), 4),
        "ok": bool(trained < 0.7 * anchor and trained < 24.0),
    }
    return result


if __name__ == "__main__":
    result = run(sys.argv[1:])
    print(json.dumps(result))
    sys.exit(0 if result["ok"] else 1)
