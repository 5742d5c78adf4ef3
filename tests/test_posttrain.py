"""SFT / DPO / GRPO trainer tests (reference: sft golden tests,
grpo_trainer correctness tests — here: structural + learning-signal checks)."""

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import create_device_mesh
from maxtext_indextts2_tpu.train.train import setup_train_state

SMALL = [
    "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
    "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
    "vocab_size=256", "max_target_length=64", "dtype=float32",
    "steps=3", "warmup_steps_fraction=0", "learning_rate=1e-3",
]


def test_sft_prompt_masking():
    from maxtext_indextts2_tpu.train.sft import sft_example_to_row

    row = sft_example_to_row([1, 2, 3, 4], [10, 11, 12], max_len=16)
    tseg = row["targets_segmentation"]
    # prompt targets (predicting tokens 2..4) are masked; completion not
    assert (tseg[:3] == 0).all()
    assert (tseg[3:6] != 0).all()
    # inputs are the sequence minus its final token (next-token shift)
    np.testing.assert_array_equal(row["inputs"][:6], [1, 2, 3, 4, 10, 11])


def test_sft_training_runs():
    from maxtext_indextts2_tpu.train.sft import train_sft

    cfg = load_config(SMALL)
    metrics = train_sft(cfg)
    assert np.isfinite(metrics["loss"])


def _setup(cfg):
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, _ = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    return mesh, model, state


def test_dpo_step_prefers_chosen():
    from maxtext_indextts2_tpu.train.dpo import dpo_loss_fn, dpo_train_step

    cfg = load_config(SMALL)
    mesh, model, state = _setup(cfg)
    ref_params = jax.tree.map(lambda x: x, state.params)

    B, S = 4, cfg.max_target_length
    rng = np.random.default_rng(0)
    batch = {}
    for side in ("chosen", "rejected"):
        toks = rng.integers(3, 200, size=(B, S)).astype(np.int32)
        batch[f"{side}_inputs"] = jnp.asarray(toks)
        batch[f"{side}_targets"] = jnp.asarray(np.roll(toks, -1, 1))
        batch[f"{side}_position"] = jnp.broadcast_to(jnp.arange(S), (B, S))
        batch[f"{side}_segmentation"] = jnp.ones((B, S), jnp.int32)
        batch[f"{side}_targets_segmentation"] = jnp.ones((B, S), jnp.int32)

    loss0, aux0 = dpo_loss_fn(model, cfg, state.params, ref_params, batch)
    assert np.isfinite(float(loss0))
    # at init pi == ref -> loss == -log sigmoid(0) == log 2
    np.testing.assert_allclose(float(loss0), np.log(2.0), atol=1e-3)

    with mesh:
        for _ in range(5):
            state, metrics = dpo_train_step(model, cfg, state, ref_params, batch,
                                            jax.random.PRNGKey(1))
    # after updates the model should prefer chosen sequences
    assert float(metrics["loss"]) < float(loss0)
    assert float(metrics["chosen_reward"]) > float(metrics["rejected_reward"])


def test_grpo_loop_improves_reward_signal():
    from maxtext_indextts2_tpu.train.grpo import grpo_train_loop

    cfg = load_config(SMALL + [
        "per_device_batch_size=0.5", "max_prefill_predict_length=16",
        "decode_sampling_strategy=weighted", "decode_sampling_temperature=1.0",
    ])
    # reward: prefer completions containing low token ids
    reward = lambda comp: -float(np.mean(comp))
    state, metrics = grpo_train_loop(cfg, reward, num_iterations=2, group_size=2)
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["kl"])


def test_grpo_cross_mesh_generation():
    """Completion generation on a DISTINCT inference mesh (reference:
    grpo_utils.py:154 pathways_reshard): train state lives fsdp-sharded,
    the engine serves tensor-sharded; weights move via device_put reshard
    each iteration and greedy completions must match the shared-mesh run."""
    from maxtext_indextts2_tpu.infer.engine import Engine
    from maxtext_indextts2_tpu.train.grpo import (
        generate_completions,
        grpo_train_loop,
        pathways_reshard,
    )

    base = SMALL + [
        "per_device_batch_size=0.5", "max_prefill_predict_length=16",
        "decode_sampling_strategy=greedy",
    ]
    cfg = load_config(base + ["ici_fsdp_parallelism=8"])
    infer_cfg = load_config(base + [
        "ici_fsdp_parallelism=4", "ici_tensor_parallelism=2",
    ])

    # (a) the reshard itself: distinct shardings, identical values
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, _ = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    engine = Engine(infer_cfg, mesh=create_device_mesh(infer_cfg))
    moved = pathways_reshard(state.params, engine, source_scanned=cfg.scan_layers)
    train_specs = {
        s.spec for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding, state.params))
    }
    infer_specs = {
        s.spec for s in jax.tree.leaves(
            jax.tree.map(lambda x: x.sharding, moved))
    }
    assert train_specs != infer_specs, "inference mesh must reshard weights"
    # values unchanged by the reshard (embedding is layout-independent; the
    # layer params change LAYOUT scanned->unrolled, not values)
    np.testing.assert_allclose(
        np.asarray(state.params["token_embedder"]["embedding"]),
        np.asarray(moved["token_embedder"]["embedding"]),
    )

    # (b) greedy completions across meshes match the shared-mesh engine
    engine.params = moved
    shared = Engine(cfg, mesh=mesh, model=model, params=state.params)
    prompts = [np.arange(1, 6, dtype=np.int32)]
    cross = generate_completions(engine, prompts, group_size=1, max_new_tokens=6)
    same = generate_completions(shared, prompts, group_size=1, max_new_tokens=6)
    assert cross == same

    # (c) the full loop runs with the inference mesh and learns finite values
    reward = lambda comp: -float(np.mean(comp))
    _, metrics = grpo_train_loop(
        cfg, reward, num_iterations=2, group_size=2, infer_cfg=infer_cfg,
    )
    assert np.isfinite(metrics["loss"])
    assert np.isfinite(metrics["kl"])


def test_posttrain_golden_values():
    """DPO/GRPO losses pinned to golden values (reference:
    test_assets/golden_data_{grpo,sft}_default.jsonl strategy) — catches
    silent loss-math regressions. Regenerate via the recipe in
    tests/golden/README."""
    import json
    import os

    from maxtext_indextts2_tpu.train.dpo import dpo_loss_fn
    from maxtext_indextts2_tpu.train.grpo import (
        group_advantages,
        grpo_loss_fn,
        log_probs_from_logits,
    )

    golden = json.load(open(
        os.path.join(os.path.dirname(__file__), "golden", "posttrain_golden.json")
    ))
    cfg = load_config([
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=16",
        "vocab_size=256", "max_target_length=32", "per_device_batch_size=1",
        "dtype=float32", "weight_dtype=float32",
    ])
    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = jnp.asarray(rng.integers(1, 256, size=(2, 32)), jnp.int32)
    variables = model.init(
        jax.random.PRNGKey(0), tokens,
        jnp.broadcast_to(jnp.arange(32), (2, 32)), jnp.ones((2, 32), jnp.int32),
    )
    params = variables["params"]
    policy = jax.tree.map(lambda x: x * 1.02 + 0.001, params)

    batch = {}
    for side in ("chosen", "rejected"):
        t = jnp.asarray(rng.integers(1, 256, size=(2, 32)), jnp.int32)
        batch[f"{side}_inputs"] = t
        batch[f"{side}_targets"] = jnp.roll(t, -1, axis=1)
        batch[f"{side}_position"] = jnp.broadcast_to(jnp.arange(32), (2, 32))
        batch[f"{side}_segmentation"] = jnp.ones((2, 32), jnp.int32)
        batch[f"{side}_targets_segmentation"] = jnp.ones((2, 32), jnp.int32)
    dpo_loss, dpo_metrics = dpo_loss_fn(model, cfg, policy, params, batch)
    assert abs(float(dpo_loss) - golden["dpo_loss"]) < 1e-4
    assert abs(float(dpo_metrics["chosen_reward"]) - golden["dpo_chosen_reward"]) < 1e-4

    comp = jnp.asarray(rng.integers(1, 256, size=(4, 32)), jnp.int32)
    rewards = jnp.asarray(rng.standard_normal(4), jnp.float32)
    adv = group_advantages(rewards, 2)
    np.testing.assert_allclose(np.asarray(adv), golden["advantages"], atol=1e-5)
    gbatch = {
        "inputs": comp, "targets": jnp.roll(comp, -1, axis=1),
        "inputs_position": jnp.broadcast_to(jnp.arange(32), (4, 32)),
        "inputs_segmentation": jnp.ones((4, 32), jnp.int32),
        "completion_weights": jnp.ones((4, 32), jnp.float32),
        "advantages": adv,
    }
    logits0 = model.apply({"params": params}, gbatch["inputs"],
                          gbatch["inputs_position"], gbatch["inputs_segmentation"])
    gbatch["old_logps"] = log_probs_from_logits(logits0, gbatch["targets"])
    grpo_loss, _ = grpo_loss_fn(model, cfg, policy, params, gbatch)
    assert abs(float(grpo_loss) - golden["grpo_loss"]) < 1e-4


def test_vision_sft_row():
    """Vision-SFT row construction: placeholder expands to image tokens,
    loss masked to the answer span, pixels preprocessed."""
    from maxtext_indextts2_tpu.train.sft import vision_sft_example_to_row

    cfg = load_config([
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=16",
        "vocab_size=256", "max_target_length=16", "per_device_batch_size=1",
        "image_token_id=250",
    ])
    img = (np.arange(32 * 32 * 3).reshape(32, 32, 3) % 255).astype(np.uint8)
    row, pixels = vision_sft_example_to_row(
        cfg, img, prompt_ids=[5, 6], answer_ids=[7, 8, 9],
        tokens_per_image=3, image_size=16,
    )
    assert row["inputs"][:8].tolist() == [5, 6, 250, 250, 250, 7, 8, 9]
    assert row["image_mask"][:8].tolist() == [False, False, True, True, True,
                                              False, False, False]
    # loss predicts exactly the answer tokens 7,8,9 (targets at pos 4,5,6)
    assert row["targets_segmentation"].tolist().count(1) == 3
    assert row["targets"][4:7].tolist() == [7, 8, 9]
    assert pixels.shape == (1, 16, 16, 3)
