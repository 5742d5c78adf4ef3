"""Training runtime tests.

Mirrors the reference's train_smoke_test.py (10-step tiny synthetic run) and
gradient-accumulation equivalence integration test.
"""

import os

import jax
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import (
    assert_params_sufficiently_sharded,
    create_device_mesh,
)
from maxtext_indextts2_tpu.train.train import setup_train_state, train_loop

TINY = os.path.join(
    os.path.dirname(__file__), "..", "maxtext_indextts2_tpu", "configs", "tiny.yml"
)

SMALL = [
    TINY,
    "max_target_length=64",
    "base_emb_dim=128",
    "base_mlp_dim=256",
    "base_num_decoder_layers=2",
    "base_num_query_heads=4",
    "base_num_kv_heads=4",
    "head_dim=32",
    "steps=6",
    "warmup_steps_fraction=0.0",
    "learning_rate=1e-3",
]


def test_train_smoke_loss_decreases():
    cfg = load_config(SMALL)
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
    # synthetic data repeats the same batch; 6 steps must overfit downward
    assert metrics["loss"] < 7.0


def test_fused_vocab_ce_matches_full_logits():
    """chunked_unembed_cross_entropy == full-logits masked CE in value AND
    gradient, for both the separate-unembed and tied-embedding heads, with
    chunk sizes that do and don't divide B*S (pad rows carry weight 0)."""
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
    from maxtext_indextts2_tpu.train.train import loss_fn

    for extra in (
        ["logits_via_embedding=false"],
        ["logits_via_embedding=true"],
        ["logits_via_embedding=false", "final_logits_soft_cap=30.0"],
    ):
        cfg_full = load_config(SMALL + ["dtype=float32", "weight_dtype=float32",
                                        "z_loss_weight=1e-4"] + extra)
        mesh = create_device_mesh(cfg_full)
        model = Transformer(cfg=cfg_full, mesh=mesh)
        state, _ = setup_train_state(cfg_full, model, mesh, jax.random.PRNGKey(0))
        batch = next(SyntheticDataIterator(cfg_full))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng = jax.random.PRNGKey(3)

        def loss_only(params, cfg):
            m = Transformer(cfg=cfg, mesh=mesh)
            loss, _ = loss_fn(m, cfg, params, batch, rng)
            return loss

        full_loss, full_grad = jax.value_and_grad(loss_only)(
            state.params, cfg_full)
        for chunk in (32, 48):  # 48 does not divide 2*64=128
            cfg_f = load_config(
                SMALL + ["dtype=float32", "weight_dtype=float32",
                         "z_loss_weight=1e-4",
                         f"fused_vocab_ce_chunk={chunk}"] + extra)
            f_loss, f_grad = jax.value_and_grad(loss_only)(
                state.params, cfg_f)
            np.testing.assert_allclose(
                np.asarray(f_loss), np.asarray(full_loss), rtol=2e-6,
                err_msg=f"{extra} chunk={chunk}")
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6),
                f_grad, full_grad,
            )


def test_fused_vocab_ce_trains():
    cfg = load_config(SMALL + ["fused_vocab_ce_chunk=64"])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
    assert metrics["loss"] < 7.0


def test_streaming_vocab_ce_matches_full_logits():
    """streaming_unembed_cross_entropy (vocab-outer tiles, custom VJP) ==
    full-logits masked CE in value AND gradient, incl. tied embedding,
    soft-cap, z-loss, and a max_tile that does not divide the vocab (the
    tile chooser falls back to a lane-aligned divisor)."""
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
    from maxtext_indextts2_tpu.train.train import loss_fn

    for extra in (
        ["logits_via_embedding=false"],
        ["logits_via_embedding=true"],
        ["logits_via_embedding=false", "final_logits_soft_cap=30.0"],
    ):
        cfg_full = load_config(SMALL + ["dtype=float32", "weight_dtype=float32",
                                        "z_loss_weight=1e-4"] + extra)
        mesh = create_device_mesh(cfg_full)
        model = Transformer(cfg=cfg_full, mesh=mesh)
        state, _ = setup_train_state(cfg_full, model, mesh, jax.random.PRNGKey(0))
        batch = next(SyntheticDataIterator(cfg_full))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
        rng = jax.random.PRNGKey(3)

        def loss_only(params, cfg):
            m = Transformer(cfg=cfg, mesh=mesh)
            loss, _ = loss_fn(m, cfg, params, batch, rng)
            return loss

        full_loss, full_grad = jax.value_and_grad(loss_only)(
            state.params, cfg_full)
        for tile in (128, 200):  # 200 is not lane-aligned -> chooser picks 128
            cfg_f = load_config(
                SMALL + ["dtype=float32", "weight_dtype=float32",
                         "z_loss_weight=1e-4",
                         f"fused_vocab_ce_tile={tile}"] + extra)
            f_loss, f_grad = jax.value_and_grad(loss_only)(
                state.params, cfg_f)
            np.testing.assert_allclose(
                np.asarray(f_loss), np.asarray(full_loss), rtol=2e-6,
                err_msg=f"{extra} tile={tile}")
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=5e-5, atol=1e-6),
                f_grad, full_grad,
            )


def test_streaming_vocab_ce_trains():
    cfg = load_config(SMALL + ["fused_vocab_ce_tile=128"])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
    assert metrics["loss"] < 7.0


def test_int8_fused_ce_matches_ste_oracle():
    """chunked_unembed_cross_entropy_int8 == a straight-through-estimator
    oracle (same quantization, full-logits CE, autodiff through STE
    reparameterization) in value (tight) and gradient (loose: the int8 path
    additionally quantizes dlog for the dy matmul)."""
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.ops.losses import (
        chunked_unembed_cross_entropy_int8,
        masked_cross_entropy,
    )

    rng = np.random.default_rng(0)
    b, s, e, v = 2, 24, 64, 512
    y = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((e, v)) * 0.05, jnp.float32)
    targets = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)
    weights = jnp.asarray(rng.integers(0, 2, (b, s)), jnp.float32)
    z, cap, scale = 1e-4, 20.0, 1.0 / np.sqrt(e)

    def fused(y, kernel):
        loss, _ = chunked_unembed_cross_entropy_int8(
            y, kernel, targets, weights, z_loss=z, chunk=16,
            soft_cap=cap, scale=scale, logits_dtype="float32")
        return loss

    def oracle(y, kernel):
        # STE: value uses the quantized operands, gradient flows straight
        # through to the raw ones
        def ste_rows(x):
            sc = jnp.maximum(jnp.max(jnp.abs(x), -1, keepdims=True), 1e-30) / 127.0
            q = jnp.round(x / sc) * sc
            return x + jax.lax.stop_gradient(q - x)

        def ste_cols(k):
            sc = jnp.maximum(jnp.max(jnp.abs(k), 0, keepdims=True), 1e-30) / 127.0
            q = jnp.round(k / sc) * sc
            return k + jax.lax.stop_gradient(q - k)

        yf = ste_rows(y.reshape(-1, e)).reshape(b, s, e)
        kf = ste_cols(kernel)
        logits = jnp.einsum("bse,ev->bsv", yf, kf) * scale
        logits = cap * jnp.tanh(logits / cap)
        loss, _ = masked_cross_entropy(logits, targets, weights, z)
        return loss

    f_loss, f_grads = jax.value_and_grad(fused, argnums=(0, 1))(y, kernel)
    o_loss, o_grads = jax.value_and_grad(oracle, argnums=(0, 1))(y, kernel)
    np.testing.assert_allclose(np.asarray(f_loss), np.asarray(o_loss),
                               rtol=1e-5)
    for got, want, tol in ((f_grads[0], o_grads[0], 0.02),
                           (f_grads[1], o_grads[1], 0.02)):
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
        assert rel < tol, rel


def test_int8_fused_ce_trains():
    cfg = load_config(SMALL + ["fused_vocab_ce_chunk=64",
                               "fused_ce_int8=true"])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
    assert metrics["loss"] < 7.0


def test_fused_ce_bf16_logit_slices():
    """fused_ce_logits_dtype=bfloat16 stays within bf16 rounding of the f32
    chunked CE (value and gradient direction) and trains."""
    import jax.numpy as jnp

    from maxtext_indextts2_tpu.ops.losses import chunked_unembed_cross_entropy

    rng = np.random.default_rng(1)
    b, s, e, v = 2, 24, 64, 512
    y = jnp.asarray(rng.standard_normal((b, s, e)), jnp.float32)
    kernel = jnp.asarray(rng.standard_normal((e, v)) * 0.05, jnp.float32)
    targets = jnp.asarray(rng.integers(0, v, (b, s)), jnp.int32)
    weights = jnp.ones((b, s), jnp.float32)

    def loss(y, kernel, ldt):
        out, _ = chunked_unembed_cross_entropy(
            y, kernel, targets, weights, z_loss=1e-4, chunk=16,
            scale=1.0 / np.sqrt(e), logits_dtype=ldt)
        return out

    l32, g32 = jax.value_and_grad(loss, argnums=(0, 1))(y, kernel, None)
    l16, g16 = jax.value_and_grad(loss, argnums=(0, 1))(y, kernel, "bfloat16")
    np.testing.assert_allclose(np.asarray(l16), np.asarray(l32), rtol=2e-2)
    for got, want in zip(g16, g32):
        got, want = np.asarray(got, np.float64), np.asarray(want, np.float64)
        rel = np.linalg.norm(got - want) / (np.linalg.norm(want) + 1e-12)
        assert rel < 0.05, rel

    cfg = load_config(SMALL + ["fused_vocab_ce_chunk=64",
                               "fused_ce_logits_dtype=bfloat16"])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"]) and metrics["loss"] < 7.0


def test_train_fsdp_tp_sharded():
    cfg = load_config(SMALL + ["ici_fsdp_parallelism=4", "ici_tensor_parallelism=2"])
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, _ = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    frac = assert_params_sufficiently_sharded(state.params, mesh, tolerance=0.1)
    assert frac == 0.0


def test_grad_accumulation_equivalence():
    """ga=2 with half micro-batch must match ga=1 within bf16 tolerance."""
    base = SMALL + ["steps=3", "gradient_clipping_threshold=0"]
    cfg1 = load_config(base + ["per_device_batch_size=2"])
    m1 = train_loop(cfg1)
    cfg2 = load_config(base + ["per_device_batch_size=1", "gradient_accumulation_steps=2"])
    m2 = train_loop(cfg2)
    assert cfg1.global_batch_size_to_train_on == cfg2.global_batch_size_to_train_on
    np.testing.assert_allclose(m1["loss"], m2["loss"], rtol=2e-2)


def test_sequence_and_context_parallel_run():
    cfg = load_config(SMALL + ["steps=2", "ici_fsdp_parallelism=2", "ici_context_parallelism=4"])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])


def test_dp_matches_fsdp_loss():
    """Pure DP and pure FSDP must produce identical losses (same math)."""
    m_dp = train_loop(load_config(SMALL + ["steps=2", "ici_fsdp_parallelism=1", "ici_data_parallelism=8"]))
    m_fsdp = train_loop(load_config(SMALL + ["steps=2"]))
    np.testing.assert_allclose(m_dp["loss"], m_fsdp["loss"], rtol=1e-2)


def test_flash_attention_training_with_cp():
    """attention=flash + context parallelism + load-balanced reorder."""
    cfg = load_config(
        SMALL
        + [
            "steps=2",
            "attention=flash",
            "ici_fsdp_parallelism=2",
            "ici_context_parallelism=4",
            "flash_block_sizes=[32,32]",
        ]
    )
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])


def test_flash_matches_dot_product_loss():
    base = SMALL + ["steps=2", "dtype=float32", "gradient_clipping_threshold=0"]
    m_dot = train_loop(load_config(base + ["attention=dot_product"]))
    m_flash = train_loop(load_config(base + ["attention=flash", "flash_block_sizes=[32,32]"]))
    np.testing.assert_allclose(m_dot["loss"], m_flash["loss"], rtol=1e-3)


def test_int8_quantized_training():
    """AQT int8 training runs and loss decreases (reference: int8 AQT path)."""
    cfg = load_config(SMALL + ["quantization=int8", "steps=4"])
    metrics = train_loop(cfg)
    assert np.isfinite(metrics["loss"])
    assert metrics["loss"] < 7.2


def test_mtp_training():
    """DeepSeek-style multi-token prediction adds a finite aux loss."""
    cfg = load_config(SMALL + ["mtp_num_layers=2", "steps=2"])
    metrics = train_loop(cfg)
    assert "mtp_loss" in metrics
    assert np.isfinite(metrics["mtp_loss"])
    assert np.isfinite(metrics["loss"])


def test_eval_loop_and_early_stop():
    """Periodic eval runs; target_eval_loss triggers early stop."""
    cfg = load_config(SMALL + [
        "steps=50", "eval_interval=2", "eval_steps=1",
        "target_eval_loss=100.0",  # trivially reached -> stop at step 1
    ])
    metrics = train_loop(cfg)
    # stopped well before 50 steps (loss from the step where we stopped)
    assert np.isfinite(metrics["loss"])


def test_lora_training_freezes_base():
    """LoRA: only adapter params update; base model starts identical (B=0)."""
    import flax

    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.train import (
        batch_sharding, jit_train_step, setup_train_state,
    )
    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator

    cfg = load_config(SMALL + ["lora_rank=4", "steps=2"])
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    flat0 = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    p_step = jit_train_step(model, cfg, mesh, shardings)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)),
        next(SyntheticDataIterator(cfg)),
    )
    with mesh:
        state, metrics = p_step(state, batch, jax.random.PRNGKey(1))
        state, metrics = p_step(state, batch, jax.random.PRNGKey(2))
    flat1 = flax.traverse_util.flatten_dict(jax.device_get(state.params))
    changed = {k for k in flat0 if not np.array_equal(flat0[k], flat1[k])}
    assert changed, "nothing trained"
    assert all("lora_" in str(k) for k in changed), f"non-lora params changed: {changed}"
    # lora_a got gradients (b starts at zero but a-grad flows via b after step 1)
    assert any("lora_b" in str(k) for k in changed)


def test_zero1_fsdp_ag_once_matches_plain():
    """Zero-1 (all-gather once per GA step) must match plain GA numerically."""
    base = SMALL + ["steps=2", "per_device_batch_size=1",
                    "gradient_accumulation_steps=2", "gradient_clipping_threshold=0"]
    m_plain = train_loop(load_config(base))
    m_zero1 = train_loop(load_config(base + ["zero1_fsdp_ag_once=true"]))
    np.testing.assert_allclose(m_plain["loss"], m_zero1["loss"], rtol=1e-3)


def test_adam_pax_matches_bias_corrected_adam():
    """adam_pax (praxis sharded_adam semantics, reference
    MaxText/optimizers.py:54): with eps_root=0 and no weight decay its
    updates must equal textbook bias-corrected Adam's m_hat/(sqrt(v_hat)+eps)
    — the folded-decay formulation is algebraically identical."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.train.optimizers import adam_pax

    b1, b2, eps, lr = 0.9, 0.95, 1e-8, 0.01
    tx = adam_pax(lambda _: lr, b1, b2, eps, 0.0, 0.0)
    params = {"w": jnp.asarray([[1.0, -2.0], [0.5, 3.0]], jnp.float32)}
    state = tx.init(params)

    rng = np.random.default_rng(0)
    m = np.zeros((2, 2)); v = np.zeros((2, 2))
    for t in range(1, 6):
        g = rng.normal(size=(2, 2)).astype(np.float32)
        upd, state = tx.update({"w": jnp.asarray(g)}, state, params)
        m = b1 * m + (1 - b1) * g
        v = b2 * v + (1 - b2) * g * g
        m_hat = m / (1 - b1 ** t)
        v_hat = v / (1 - b2 ** t)
        want = -lr * m_hat / (np.sqrt(v_hat) + eps)
        np.testing.assert_allclose(np.asarray(upd["w"]), want, rtol=2e-5, atol=1e-7)


def test_adam_pax_weight_decay_not_decoupled():
    """adam_pax adds weight decay to the PRE-lr update (pax convention),
    unlike adamw's decoupled decay."""
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.train.optimizers import adam_pax

    lr, wd = 0.1, 0.5
    tx = adam_pax(lambda _: lr, 0.9, 0.95, 1e-8, 0.0, wd)
    params = {"w": jnp.asarray([2.0], jnp.float32)}
    state = tx.init(params)
    g = np.asarray([1.0], np.float32)
    upd, _ = tx.update({"w": jnp.asarray(g)}, state, params)
    # t=1: m_hat = g, v_hat = g^2 -> adam term = 1.0 (+eps); decay adds wd*w
    want = -lr * (1.0 / (1.0 + 1e-8) + wd * 2.0)
    np.testing.assert_allclose(np.asarray(upd["w"]), [want], rtol=1e-5)


def test_adam_pax_trains():
    """opt_type=adam_pax runs a real train step and the loss is finite."""
    import jax
    import numpy as np

    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.models import Transformer
    from maxtext_indextts2_tpu.parallel import create_device_mesh
    from maxtext_indextts2_tpu.train.data.synthetic import SyntheticDataIterator
    from maxtext_indextts2_tpu.train.train import (
        batch_sharding, jit_train_step, setup_train_state,
    )

    cfg = load_config(SMALL + ["opt_type=adam_pax"])
    mesh = create_device_mesh(cfg)
    model = Transformer(cfg=cfg, mesh=mesh)
    state, (shardings, _) = setup_train_state(cfg, model, mesh, jax.random.PRNGKey(0))
    p = jit_train_step(model, cfg, mesh, shardings)
    batch = jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh)),
        next(SyntheticDataIterator(cfg)),
    )
    with mesh:
        # SMALL's warmup is 1 step, so schedule(0) == 0 — the first update
        # is a no-op; compare step 3 against step 1
        state, m = p(state, batch, jax.random.PRNGKey(1))
        state, _ = p(state, batch, jax.random.PRNGKey(2))
        state, m3 = p(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(np.asarray(m3["loss"])))
    assert float(np.asarray(m3["loss"])) < float(np.asarray(m["loss"]))


def test_grad_clip_keeps_bf16_grad_dtype():
    """The global-norm clip scale must not promote bf16 grads to f32 —
    promotion bloats adam state 2x and breaks train-step donation aliasing
    (measured OOM at 1.28B on one v5e chip)."""
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.train.train import _clip_by_global_norm

    grads = {"a": jnp.ones((4, 4), jnp.bfloat16) * 100.0}
    clipped, norm = _clip_by_global_norm(grads, 1.0)
    assert clipped["a"].dtype == jnp.bfloat16
    assert norm.dtype == jnp.float32
    np.testing.assert_allclose(
        float(jnp.sqrt(jnp.sum(jnp.square(clipped["a"].astype(jnp.float32))))),
        1.0, rtol=1e-2,
    )
