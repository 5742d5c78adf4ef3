"""Codec trainers: acoustic codec + RepCodec autoencoders.

The reference trains its codecs out-of-band (torch, Amphion); here both are
first-class jitted loops. Losses:

- acoustic: multi-scale log-mel reconstruction L1 + waveform L1 + RVQ
  commitment/codebook losses (GAN discriminators intentionally omitted —
  generator-only pretraining; adversarial fine-tune can layer on top).
- repcodec: feature reconstruction MSE + VQ losses.

Run: ``python -m maxtext_indextts2_tpu.train.codec_train <cfg.yml>
codec_target=acoustic|repcodec steps=...``
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maxtext_indextts2_tpu.audio import mel as mel_lib
from maxtext_indextts2_tpu.audio.acoustic import AcousticCodec
from maxtext_indextts2_tpu.audio.repcodec import RepCodec
from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.train.optimizers import (
    create_learning_rate_schedule,
    get_optimizer,
)
from maxtext_indextts2_tpu.utils.metrics import MetricLogger


def mel_l1(wav_a: jax.Array, wav_b: jax.Array) -> jax.Array:
    """Multi-scale log-mel L1 (vocos-style reconstruction loss)."""
    loss = 0.0
    for n_fft, hop in ((512, 128), (1024, 256), (2048, 512)):
        ma = mel_lib.mel_spectrogram(wav_a, n_mels=80, sample_rate=24000,
                                     n_fft=n_fft, hop=hop)
        mb = mel_lib.mel_spectrogram(wav_b, n_mels=80, sample_rate=24000,
                                     n_fft=n_fft, hop=hop)
        loss = loss + jnp.mean(jnp.abs(ma - mb))
    return loss / 3.0


def _reseed_dead_codes(params, usage, rng, threshold: int = 0,
                       jitter: float = 0.05):
    """Replace unused RVQ codebook rows with jittered copies of busy rows.

    Straight-through FVQ has no gradient path to never-selected rows, so a
    codebook that starts badly collapses to a handful of codes (measured:
    1 distinct code per layer after 150 tiny-scale steps). The standard fix
    (reference quantize_extended.py EuclideanCodebook dead-code expiry, here
    applied to the acoustic codec's FVQ stack): every reseed period, dead
    rows (usage <= threshold over the window) are re-seeded near rows that
    ARE used, splitting their clusters.

    usage: [Q, K] selection counts. Returns updated params (host-side).
    """
    p = params["params"] if "params" in params else params
    vqs = p["decoder"]["quantizer"]
    rng = np.random.default_rng(rng)
    for q in range(usage.shape[0]):
        name = f"vq_{q}"
        if name not in vqs:
            continue
        cb = np.array(vqs[name]["codebook"])
        used = usage[q] > threshold
        if used.all() or not used.any():
            continue
        dead = np.where(~used)[0]
        busy = np.where(used)[0]
        donors = rng.choice(busy, size=dead.size,
                            p=usage[q][busy] / usage[q][busy].sum())
        noise = rng.standard_normal((dead.size, cb.shape[1])).astype(cb.dtype)
        cb[dead] = cb[donors] + jitter * noise * np.linalg.norm(
            cb[donors], axis=-1, keepdims=True
        )
        vqs[name]["codebook"] = jnp.asarray(cb)
    return params


def train_acoustic_codec(cfg: Config, batch_fn=None, codec_kwargs=None,
                         reseed_period: int = 20) -> dict:
    """codec_kwargs: extra AcousticCodec fields (e.g. small vocos dims for
    CPU-trainable recipes — benchmarks/recipes/mcd_parity.py).
    reseed_period: dead-codebook-row reseeding cadence (0 = off)."""
    codec = AcousticCodec(
        num_quantizers=cfg.s2a_num_quantizers,
        codebook_size=cfg.s2a_codebook_size,
        quantizer_dropout=cfg.codec_quantizer_dropout,
        **(codec_kwargs or {}),
    )
    hop = int(np.prod(codec.strides))
    seconds = 0.5
    t = int(24000 * seconds) // hop * hop

    def default_batch(step):
        rng = np.random.default_rng(cfg.data_shuffle_seed + step)
        b = max(1, cfg.global_batch_size_to_train_on)
        x = rng.standard_normal((b, t)).astype(np.float32) * 0.1
        return {"wav": x}

    batch_fn = batch_fn or default_batch
    rng = jax.random.PRNGKey(cfg.init_weights_seed)
    params = codec.init(rng, jnp.asarray(batch_fn(0)["wav"]))
    schedule = create_learning_rate_schedule(cfg)
    tx = get_optimizer(cfg, schedule)
    if cfg.gradient_clipping_threshold > 0:
        # RVQ/codec losses spike early (measured 300 -> 14k at lr 1e-3);
        # the main trainer clips, these loops must too
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clipping_threshold), tx
        )
    opt_state = tx.init(params)

    drop_key = jax.random.PRNGKey(cfg.init_weights_seed + 1)

    @jax.jit
    def step_fn(params, opt_state, wav, step):
        def loss_fn(p):
            # per-step rng activates quantizer dropout when configured
            recon, idx, commit, cb = codec.apply(
                p, wav, dropout_rng=jax.random.fold_in(drop_key, step)
            )
            n = min(recon.shape[-1], wav.shape[-1])
            l_wav = jnp.mean(jnp.abs(recon[..., :n] - wav[..., :n]))
            l_mel = mel_l1(recon[..., :n], wav[..., :n])
            loss = l_mel + 0.1 * l_wav + commit + cb
            # per-layer code-usage histogram for dead-code reseeding
            usage = jax.vmap(
                lambda rows: jnp.bincount(
                    rows.reshape(-1), length=cfg.s2a_codebook_size
                )
            )(idx)
            return loss, {"mel_l1": l_mel, "wav_l1": l_wav, "commit": commit,
                          "_usage": usage}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, {"loss": loss, **aux}

    return _loop(cfg, step_fn, params, opt_state, batch_fn, key="wav",
                 reseed_period=reseed_period)


def train_repcodec(cfg: Config, batch_fn=None) -> dict:
    codec = RepCodec(
        hidden_size=cfg.s2a_hidden_size,
        codebook_size=cfg.semantic_codebook_size,
        vocos_num_layers=4,
    )

    def default_batch(step):
        rng = np.random.default_rng(cfg.data_shuffle_seed + step)
        b = max(1, cfg.global_batch_size_to_train_on)
        return {"feats": rng.standard_normal((b, 64, cfg.s2a_hidden_size)).astype(np.float32)}

    batch_fn = batch_fn or default_batch
    rng = jax.random.PRNGKey(cfg.init_weights_seed)
    params = codec.init(rng, jnp.asarray(batch_fn(0)["feats"]))
    schedule = create_learning_rate_schedule(cfg)
    tx = get_optimizer(cfg, schedule)
    if cfg.gradient_clipping_threshold > 0:
        # RVQ/codec losses spike early (measured 300 -> 14k at lr 1e-3);
        # the main trainer clips, these loops must too
        tx = optax.chain(
            optax.clip_by_global_norm(cfg.gradient_clipping_threshold), tx
        )
    opt_state = tx.init(params)

    @jax.jit
    def step_fn(params, opt_state, feats, step):  # step unused (no dropout here)
        def loss_fn(p):
            recon, idx, commit, cb = codec.apply(p, feats)
            l_rec = jnp.mean(jnp.square(recon - feats))
            return l_rec + commit + cb, {"rec_mse": l_rec, "commit": commit}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, {"loss": loss, **aux}

    return _loop(cfg, step_fn, params, opt_state, batch_fn, key="feats")


def _loop(cfg, step_fn, params, opt_state, batch_fn, key, reseed_period=0):
    logger = MetricLogger(cfg)
    metrics = {}
    usage_acc = None
    last = time.perf_counter()
    for step in range(cfg.steps):
        batch = jnp.asarray(batch_fn(step)[key])
        params, opt_state, metrics = step_fn(params, opt_state, batch,
                                             jnp.asarray(step))
        usage = metrics.pop("_usage", None)  # never logged/returned
        if usage is not None and reseed_period:
            usage = np.asarray(usage)
            usage_acc = usage if usage_acc is None else usage_acc + usage
            if (step + 1) % reseed_period == 0 and step < cfg.steps - 1:
                params = _reseed_dead_codes(params, usage_acc, rng=step)
                usage_acc = None
        now = time.perf_counter()
        logger.write_step(step, metrics, step_time=now - last)
        last = now
    logger.close()
    out = {k: np.asarray(v) for k, v in metrics.items()}
    out["params"] = params  # trained weights, for reconstruction/MCD recipes
    return out


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    target = "acoustic"
    keep = []
    for a in argv:
        if a.startswith("codec_target="):
            target = a.split("=", 1)[1]
        else:
            keep.append(a)
    cfg = load_config(keep)
    fn = train_acoustic_codec if target == "acoustic" else train_repcodec
    metrics = fn(cfg)
    print({k: float(np.asarray(v).mean()) for k, v in metrics.items()
           if k != "params"})


if __name__ == "__main__":
    main()
