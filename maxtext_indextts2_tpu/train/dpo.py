"""Direct Preference Optimization.

Reference: MaxText/train.py:140 dpo_loss_fn (+ grain DPO pipeline). Batch
carries chosen/rejected token rows; the loss is

    -log sigmoid(beta * ((pi_c - ref_c) - (pi_r - ref_r)))

with per-sequence summed log-probs over completion tokens. Reference params
are a frozen copy carried alongside the train state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.sampling import log_probs_from_logits


def _seq_logprob(model, params, tokens, positions, segs, targets, weights):
    logits = model.apply({"params": params}, tokens, positions, segs)
    lp = log_probs_from_logits(logits, targets)
    return jnp.sum(lp * weights, axis=-1)  # [B]


def dpo_loss_fn(model, cfg: Config, params, ref_params, batch, beta: float = 0.1):
    """batch keys: {chosen,rejected}_{inputs,targets,position,segmentation}."""
    def lp(p, side):
        w = (batch[f"{side}_targets_segmentation"] != 0).astype(jnp.float32)
        return _seq_logprob(
            model, p,
            batch[f"{side}_inputs"], batch[f"{side}_position"],
            batch[f"{side}_segmentation"], batch[f"{side}_targets"], w,
        )

    pi_c, pi_r = lp(params, "chosen"), lp(params, "rejected")
    ref_c = jax.lax.stop_gradient(lp(ref_params, "chosen"))
    ref_r = jax.lax.stop_gradient(lp(ref_params, "rejected"))

    logits = beta * ((pi_c - ref_c) - (pi_r - ref_r))
    loss = -jnp.mean(jax.nn.log_sigmoid(logits))
    aux = {
        "dpo_accuracy": jnp.mean((pi_c - ref_c > pi_r - ref_r).astype(jnp.float32)),
        "chosen_reward": jnp.mean(beta * (pi_c - ref_c)),
        "rejected_reward": jnp.mean(beta * (pi_r - ref_r)),
    }
    return loss, aux


def dpo_train_step(model, cfg: Config, state, ref_params, batch, rng, beta: float = 0.1):
    grad_fn = jax.value_and_grad(
        functools.partial(dpo_loss_fn, model, cfg), has_aux=True
    )
    (loss, aux), grads = grad_fn(state.params, ref_params, batch, beta)
    new_state = state.apply_gradients(grads=grads)
    return new_state, {"loss": loss, **aux}


class DPODataIterator:
    """Paired preference batches (reference: grain DPO variant,
    _grain_data_processing.py:152). Source yields (chosen_ids, rejected_ids)
    token lists; default synthetic pairs make the loop runnable anywhere."""

    def __init__(self, cfg: Config, source=None):
        self.cfg = cfg
        self.source = source or self._synthetic()

    def _synthetic(self):
        import numpy as np

        rng = np.random.default_rng(self.cfg.data_shuffle_seed)
        s = self.cfg.max_target_length
        v = self.cfg.vocab_size
        # learnable preference: shared prompt prefix, chosen completions draw
        # from the low half of the vocab, rejected from the high half — a
        # few optimizer steps push chosen_reward above rejected_reward (the
        # demo/e2e signal; real use passes a source of token-id pairs)
        while True:
            base = rng.integers(1, v, size=s // 2).tolist()
            n = s - len(base)
            yield (base + rng.integers(1, max(v // 2, 2), size=n).tolist(),
                   base + rng.integers(v // 2, v, size=n).tolist())

    def __iter__(self):
        return self

    def __next__(self):
        import numpy as np

        cfg = self.cfg
        b, s = cfg.global_batch_size_to_load, cfg.max_target_length
        batch = {}
        rows = [next(self.source) for _ in range(b)]
        for side, idx in (("chosen", 0), ("rejected", 1)):
            toks = np.zeros((b, s), np.int32)
            for i, pair in enumerate(rows):
                ids = list(pair[idx])[:s]
                toks[i, : len(ids)] = ids
            batch[f"{side}_inputs"] = toks
            batch[f"{side}_targets"] = np.roll(toks, -1, axis=1)
            batch[f"{side}_position"] = np.broadcast_to(
                np.arange(s, dtype=np.int32), (b, s)).copy()
            seg = (toks != 0).astype(np.int32)
            batch[f"{side}_segmentation"] = seg
            batch[f"{side}_targets_segmentation"] = np.roll(seg, -1, axis=1)
        return batch


def train_dpo(cfg: Config):
    """DPO loop: frozen reference = the initial policy (reference:
    dpo train path in train.py:140 dpo_loss_fn wiring)."""
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.train import setup_train_state

    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(cfg.seed))
    # a real COPY: the policy state is donated per step, and the reference
    # must not alias donated buffers
    ref_params = jax.tree.map(jnp.copy, state.params)
    p_step = jax.jit(
        functools.partial(dpo_train_step, model, cfg),
        donate_argnums=(0,),
        static_argnames=("beta",),
    )
    it = DPODataIterator(cfg)
    rng = jax.random.PRNGKey(cfg.seed)
    metrics = {}
    with mesh:
        for step in range(cfg.steps):
            batch = {k: jnp.asarray(v) for k, v in next(it).items()}
            rng, srng = jax.random.split(rng)
            state, metrics = p_step(state, ref_params, batch, srng)
            if step % 10 == 0 or step == cfg.steps - 1:
                print(f"dpo step {step}: " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in metrics.items()))
    return jax.tree.map(lambda x: float(x), metrics)


def main(argv=None):
    import sys

    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config(sys.argv[1:] if argv is None else argv)
    return train_dpo(cfg)


if __name__ == "__main__":
    main()
