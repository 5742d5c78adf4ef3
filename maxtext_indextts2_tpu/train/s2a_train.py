"""S2A (semantic->acoustic) model trainer.

The reference trains MaskGCT S2A out-of-band in torch (maskgct_s2a.py
compute_loss); here it is a first-class jitted training loop sharing the
framework's optimizer/checkpoint/metrics stack. Data: (acoustic codes
[B,T,Q], semantic codes [B,T]) pairs — synthetic by default, or produced by
the on-device tokenizers over an audio dataset.

Run: ``python -m maxtext_indextts2_tpu.train.s2a_train <cfg.yml> steps=100 ...``
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel
from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.train.optimizers import (
    create_learning_rate_schedule,
    get_optimizer,
)
from maxtext_indextts2_tpu.utils.metrics import MetricLogger


def s2a_config_from(cfg: Config) -> S2AConfig:
    return S2AConfig(
        num_quantizers=cfg.s2a_num_quantizers,
        hidden_size=cfg.s2a_hidden_size,
        num_layers=cfg.s2a_num_layers,
        num_heads=cfg.s2a_num_heads,
        codebook_size=cfg.s2a_codebook_size,
        cond_codebook_size=cfg.s2a_cond_codebook_size,
        mask_layer_schedule=cfg.s2a_mask_schedule,
        dtype=jnp.dtype(cfg.dtype),
    )


def synthetic_s2a_batch(cfg: Config, step: int):
    rng = np.random.default_rng(cfg.data_shuffle_seed + step)
    b = max(1, cfg.global_batch_size_to_train_on)
    t = min(cfg.max_target_length, 512)
    return {
        "acoustic": rng.integers(0, cfg.s2a_codebook_size, (b, t, cfg.s2a_num_quantizers)).astype(np.int32),
        "semantic": rng.integers(0, cfg.s2a_cond_codebook_size, (b, t)).astype(np.int32),
        "mask": np.ones((b, t), np.int32),
    }


def train_s2a(cfg: Config, batch_fn=None) -> dict:
    scfg = s2a_config_from(cfg)
    model = S2AModel(scfg)
    rng = jax.random.PRNGKey(cfg.init_weights_seed)
    batch_fn = batch_fn or (lambda step: synthetic_s2a_batch(cfg, step))

    b0 = batch_fn(0)
    params = model.init(
        rng, jnp.asarray(b0["acoustic"]), jnp.asarray(b0["mask"]),
        jnp.asarray(b0["semantic"]), rng,
    )
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
    def step_fn(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, aux = model.apply(
                p, batch["acoustic"], batch["mask"], batch["semantic"], rng
            )
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, {"loss": loss, **{k: v for k, v in aux.items()}}

    logger = MetricLogger(cfg)
    metrics = {}
    last = time.perf_counter()
    for step in range(cfg.steps):
        batch = {k: jnp.asarray(v) for k, v in batch_fn(step).items()}
        rng, srng = jax.random.split(rng)
        params, opt_state, metrics = step_fn(params, opt_state, batch, srng)
        now = time.perf_counter()
        logger.write_step(step, metrics, step_time=now - last)
        last = now

    if cfg.enable_checkpointing:
        from maxtext_indextts2_tpu.train.checkpointing import save_params_only

        save_params_only(cfg.checkpoint_dir + "/s2a_params", params)
    logger.close()
    out = {k: np.asarray(v) for k, v in metrics.items()}
    out["params"] = params  # trained weights, for sampling/quality recipes
    return out


def main(argv=None):
    import sys

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    metrics = train_s2a(cfg)
    print({k: float(np.asarray(v).mean()) for k, v in metrics.items()
           if k != "params"})


if __name__ == "__main__":
    main()
