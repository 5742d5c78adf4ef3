import sys, json; sys.path.insert(0, '/root/repo')
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp, numpy as np
from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.train.dpo import dpo_loss_fn
from maxtext_indextts2_tpu.train.grpo import grpo_loss_fn, group_advantages

cfg = load_config([
    "base_emb_dim=64","base_mlp_dim=128","base_num_decoder_layers=2",
    "base_num_query_heads=4","base_num_kv_heads=4","head_dim=16","vocab_size=256",
    "max_target_length=32","per_device_batch_size=1","dtype=float32","weight_dtype=float32"])
model = Transformer(cfg=cfg)
rng = np.random.default_rng(0)
tokens = jnp.asarray(rng.integers(1, 256, size=(2, 32)), jnp.int32)
variables = model.init(jax.random.PRNGKey(0), tokens, jnp.broadcast_to(jnp.arange(32),(2,32)), jnp.ones((2,32),jnp.int32))
params = variables["params"]
# a perturbed policy makes the losses nontrivial functions of the forward
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

comp = jnp.asarray(rng.integers(1, 256, size=(4, 32)), jnp.int32)
rewards = jnp.asarray(rng.standard_normal(4), jnp.float32)
adv = group_advantages(rewards, 2)
import jax as _jx
gbatch = {
    "inputs": comp, "targets": jnp.roll(comp, -1, axis=1),
    "inputs_position": jnp.broadcast_to(jnp.arange(32), (4, 32)),
    "inputs_segmentation": jnp.ones((4, 32), jnp.int32),
    "completion_weights": jnp.ones((4, 32), jnp.float32),
    "advantages": adv,
}
from maxtext_indextts2_tpu.train.grpo import log_probs_from_logits
logits0 = model.apply({"params": params}, gbatch["inputs"],
                      gbatch["inputs_position"], gbatch["inputs_segmentation"])
gbatch["old_logps"] = log_probs_from_logits(logits0, gbatch["targets"])
grpo_loss, grpo_metrics = grpo_loss_fn(model, cfg, policy, params, gbatch)
golden = {
    "dpo_loss": float(dpo_loss),
    "dpo_chosen_reward": float(dpo_metrics["chosen_reward"]),
    "grpo_loss": float(grpo_loss),
    "advantages": [float(a) for a in adv],
}
open("/root/repo/tests/golden/posttrain_golden.json", "w").write(json.dumps(golden, indent=1))
print(json.dumps(golden))
