"""GRPO (Group Relative Policy Optimization) RLHF trainer.

Reference: MaxText/experimental/rl/grpo_trainer.py (:171 loss, :345
train_step, :585 generate_completions, :640 train_loop) + grpo_utils.py.
Per prompt, G completions are sampled with the inference engine; rewards are
group-normalized into advantages; the policy gradient uses a
clipped-importance objective with a KL penalty against frozen reference
params (computed with the low-variance k3 estimator).
"""

from __future__ import annotations

import functools
from collections.abc import Callable

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.sampling import log_probs_from_logits


def grpo_loss_fn(
    model, cfg: Config, params, ref_params, batch,
    beta: float = 0.04, epsilon: float = 0.2,
):
    """batch: inputs/positions/segmentation/targets [B*G, S], completion mask
    ``completion_weights`` [B*G, S], advantages [B*G], behavior logps
    ``old_logps`` [B*G, S] (from the sampling pass)."""
    logits = model.apply(
        {"params": params},
        batch["inputs"], batch["inputs_position"], batch["inputs_segmentation"],
    )
    logps = log_probs_from_logits(logits, batch["targets"])
    ref_logits = model.apply(
        {"params": ref_params},
        batch["inputs"], batch["inputs_position"], batch["inputs_segmentation"],
    )
    ref_logps = jax.lax.stop_gradient(
        log_probs_from_logits(ref_logits, batch["targets"])
    )

    w = batch["completion_weights"]
    adv = batch["advantages"][:, None]

    ratio = jnp.exp(logps - batch["old_logps"])
    unclipped = ratio * adv
    clipped = jnp.clip(ratio, 1 - epsilon, 1 + epsilon) * adv
    pg = -jnp.minimum(unclipped, clipped)

    # k3 KL estimator: exp(ref-pi) - (ref-pi) - 1
    d = ref_logps - logps
    kl = jnp.exp(d) - d - 1.0

    denom = jnp.maximum(jnp.sum(w), 1.0)
    loss = jnp.sum((pg + beta * kl) * w) / denom
    aux = {
        "kl": jnp.sum(kl * w) / denom,
        "mean_advantage": jnp.mean(batch["advantages"]),
    }
    return loss, aux


def group_advantages(rewards: jax.Array, group_size: int) -> jax.Array:
    """[B*G] rewards -> group-normalized advantages (mean/std per prompt)."""
    r = rewards.reshape(-1, group_size)
    mean = jnp.mean(r, axis=1, keepdims=True)
    std = jnp.std(r, axis=1, keepdims=True)
    return ((r - mean) / (std + 1e-6)).reshape(-1)


def grpo_train_step(model, cfg, state, ref_params, batch, rng,
                    beta: float = 0.04, epsilon: float = 0.2):
    grad_fn = jax.value_and_grad(
        functools.partial(grpo_loss_fn, model, cfg), has_aux=True
    )
    (loss, aux), grads = grad_fn(state.params, ref_params, batch, beta, epsilon)
    new_state = state.apply_gradients(grads=grads)
    return new_state, {"loss": loss, **aux}


def generate_completions(
    engine, prompts: list[np.ndarray], group_size: int, max_new_tokens: int,
) -> list[list[list[int]]]:
    """G sampled completions per prompt via the inference engine
    (reference: grpo_trainer.py:585 uses the offline engine the same way)."""
    out = []
    for prompt in prompts:
        group = [
            engine.generate_stream(prompt, max_new_tokens)
            for _ in range(group_size)
        ]
        out.append(group)
    return out


def build_grpo_batch(
    prompts: list[np.ndarray],
    completions: list[list[list[int]]],
    rewards: np.ndarray,  # [B, G]
    max_len: int,
) -> dict:
    """Assemble [B*G, S] training rows from prompts + sampled completions."""
    rows = {k: [] for k in ("inputs", "targets", "inputs_position",
                            "inputs_segmentation", "completion_weights")}
    for prompt, group in zip(prompts, completions):
        for comp in group:
            seq = np.concatenate([prompt, np.asarray(comp, np.int32)])[: max_len + 1]
            inputs = np.zeros(max_len, np.int32)
            targets = np.zeros(max_len, np.int32)
            n = len(seq) - 1
            inputs[:n] = seq[:-1]
            targets[:n] = seq[1:]
            seg = np.zeros(max_len, np.int32)
            seg[:n] = 1
            w = np.zeros(max_len, np.float32)
            w[len(prompt) - 1 : n] = 1.0  # loss over completion only
            rows["inputs"].append(inputs)
            rows["targets"].append(targets)
            rows["inputs_position"].append(np.arange(max_len, dtype=np.int32))
            rows["inputs_segmentation"].append(seg)
            rows["completion_weights"].append(w)
    batch = {k: np.stack(v) for k, v in rows.items()}
    g = len(completions[0])
    batch["advantages"] = np.asarray(
        jax.device_get(group_advantages(jnp.asarray(rewards.reshape(-1)), g))
    )
    return batch


def pathways_reshard(params, engine, source_scanned: bool | None = None):
    """Move a train-state param tree onto an inference engine's mesh/shardings.

    device_put-based cross-mesh reshard — the framework's stand-in for the
    reference's ``pathways_reshard`` (experimental/rl/grpo_utils.py:154),
    which moves policy weights from the training mesh to an
    inference-optimal mesh for completion generation. Handles the layout
    difference too: scanned (stacked-layer) training params are unrolled
    when the engine serves unrolled layers."""
    if source_scanned and not engine.cfg.scan_layers:
        from maxtext_indextts2_tpu.infer.engine import unroll_scanned_params

        params = unroll_scanned_params(params)
    return jax.tree.map(jax.device_put, params, engine.param_shardings())


def grpo_train_loop(
    cfg: Config,
    reward_fn: Callable[[list[int]], float],
    num_iterations: int = 4,
    group_size: int = 4,
    prompts: list[np.ndarray] | None = None,
    infer_cfg: Config | None = None,
):
    """Minimal GRPO loop: sample -> reward -> advantage -> update.

    ``infer_cfg`` (same model dims, different parallelism degrees) runs
    completion generation on its OWN mesh: each iteration the fresh policy
    weights are resharded train-mesh -> inference-mesh via
    ``pathways_reshard`` (reference: grpo_trainer.py:585 generating through
    the offline engine on an inference-optimal mesh)."""
    from maxtext_indextts2_tpu.infer.engine import Engine
    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.train import setup_train_state

    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    ref_params = jax.tree.map(lambda x: x, state.params)

    if infer_cfg is not None:
        engine = Engine(infer_cfg, mesh=create_device_mesh(infer_cfg))
    else:
        engine = Engine(cfg, mesh=mesh, model=model, params=state.params)
    if prompts is None:
        prompts = [np.arange(1, 6, dtype=np.int32)]

    rng = jax.random.PRNGKey(cfg.seed)
    metrics = {}
    for it in range(num_iterations):
        # policy weights for sampling (cross-mesh reshard when the engine
        # runs on its own inference mesh)
        if infer_cfg is not None:
            engine.params = pathways_reshard(
                state.params, engine, source_scanned=cfg.scan_layers
            )
        else:
            engine.params = state.params
        completions = generate_completions(
            engine, prompts, group_size, max_new_tokens=8
        )
        rewards = np.asarray(
            [[reward_fn(c) for c in group] for group in completions], np.float32
        )
        batch = build_grpo_batch(prompts, completions, rewards, cfg.max_target_length)
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        # behavior logps from the current policy (one extra forward)
        logits = model.apply({"params": state.params}, batch["inputs"],
                             batch["inputs_position"], batch["inputs_segmentation"])
        batch["old_logps"] = jax.lax.stop_gradient(
            log_probs_from_logits(logits, batch["targets"])
        )
        rng, step_rng = jax.random.split(rng)
        with mesh:
            state, metrics = grpo_train_step(
                model, cfg, state, ref_params, batch, step_rng
            )
    return state, {k: np.asarray(v) for k, v in metrics.items()}


def main(argv=None):
    """CLI demo: GRPO against a length-preference reward (reference:
    grpo_trainer.py main; real use passes a task reward_fn to
    grpo_train_loop)."""
    import sys

    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config(sys.argv[1:] if argv is None else argv)

    def reward_fn(completion: list[int]) -> float:
        # demo: prefer long completions without token 0 (pad/eos)
        return float(len([t for t in completion if t != 0]))

    _, metrics = grpo_train_loop(cfg, reward_fn)
    print({k: float(v) for k, v in metrics.items()})
    return metrics


if __name__ == "__main__":
    main()
