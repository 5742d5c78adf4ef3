"""Model tests: forward shapes, decode parity, scan parity, block styles.

Mirrors the reference's attention/decode parity strategy
(MaxText/tests/attention_test.py) at tiny scale on the CPU mesh.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import (
    MODE_AUTOREGRESSIVE,
    MODE_PREFILL,
    Transformer,
)

TINY = os.path.join(
    os.path.dirname(__file__), "..", "maxtext_indextts2_tpu", "configs", "tiny.yml"
)


def _make(cfg_args, seq=32):
    cfg = load_config([TINY] + cfg_args + [f"max_target_length={seq}"])
    model = Transformer(cfg=cfg)
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, seq), 0, cfg.vocab_size)
    positions = jnp.broadcast_to(jnp.arange(seq), (1, seq))
    segs = jnp.ones((1, seq), jnp.int32)
    params = jax.jit(model.init)(key, tokens, positions, segs)
    return cfg, model, params, tokens, positions, segs


def test_forward_shapes():
    cfg, model, params, tokens, positions, segs = _make([])
    logits = jax.jit(model.apply)(params, tokens, positions, segs)
    assert logits.shape == (1, 32, cfg.vocab_size)
    assert logits.dtype == jnp.float32
    assert np.isfinite(np.asarray(logits)).all()


def test_scan_vs_unscan_parity():
    _, model_s, params_s, tokens, positions, segs = _make(
        ["scan_layers=true", "dtype=float32"]
    )
    cfg_u = load_config([TINY, "scan_layers=false", "dtype=float32", "max_target_length=32"])
    model_u = Transformer(cfg=cfg_u)
    params_u = jax.jit(model_u.init)(jax.random.PRNGKey(0), tokens, positions, segs)

    # same per-layer tree sizes
    n_s = sum(x.size for x in jax.tree.leaves(params_s))
    n_u = sum(x.size for x in jax.tree.leaves(params_u))
    assert n_s == n_u

    # copy scanned params into the unscanned layout and compare outputs
    flat_u = jax.tree_util.tree_flatten_with_path(params_u)[0]
    import flax

    ps = flax.traverse_util.flatten_dict(flax.linen.meta.unbox(params_s)["params"])
    pu = flax.traverse_util.flatten_dict(flax.linen.meta.unbox(params_u)["params"])
    remapped = {}
    for ku, vu in pu.items():
        if ku[1].startswith("layers_"):
            idx = int(ku[1].split("_")[-1])
            ks = (ku[0], "layers") + ku[2:]
            remapped[ku] = ps[ks][idx]
        else:
            remapped[ku] = ps[ku]
    params_u2 = {"params": flax.traverse_util.unflatten_dict(remapped)}
    out_s = model_s.apply(params_s, tokens, positions, segs)
    out_u = model_u.apply(params_u2, tokens, positions, segs)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_u), atol=1e-4)


@pytest.mark.parametrize(
    "style_args",
    [
        [],
        ["decoder_block=qwen3"],
        ["decoder_block=gemma2", "sliding_window_size=8", "base_num_decoder_layers=2"],
        ["decoder_block=gpt3"],
    ],
)
def test_decode_parity(style_args):
    """Prefill + AR decode must reproduce the train-mode forward."""
    cfg, model, params, tokens, positions, segs = _make(style_args, seq=32)
    S = 8
    logits_full = model.apply(params, tokens, positions, segs)
    logits_pre, vars_ = model.apply(
        params, tokens[:, :S], positions[:, :S], segs[:, :S],
        mode=MODE_PREFILL, mutable=["cache"],
    )
    np.testing.assert_allclose(
        np.asarray(logits_pre[0, :S]), np.asarray(logits_full[0, :S]), atol=3e-2
    )
    cache = vars_["cache"]
    for i in range(S, S + 2):
        logits_ar, vars_ = model.apply(
            {**params, "cache": cache},
            tokens[:, i : i + 1],
            positions[:, i : i + 1],
            jnp.ones((1, 1), jnp.int32),
            mode=MODE_AUTOREGRESSIVE,
            mutable=["cache"],
        )
        cache = vars_["cache"]
        np.testing.assert_allclose(
            np.asarray(logits_ar[0, 0]), np.asarray(logits_full[0, i]), atol=5e-2
        )


def test_packing_segment_isolation():
    """Tokens in segment 2 must not attend to segment 1."""
    cfg, model, params, tokens, positions, segs = _make([], seq=32)
    # two packed sequences: [0:16) seg1, [16:32) seg2 with restarted positions
    positions2 = jnp.concatenate(
        [jnp.arange(16), jnp.arange(16)], axis=0
    )[None, :]
    segs2 = jnp.concatenate(
        [jnp.ones(16, jnp.int32), 2 * jnp.ones(16, jnp.int32)], axis=0
    )[None, :]
    out_packed = model.apply(params, tokens, positions2, segs2)
    # same second segment alone at start of sequence
    out_alone = model.apply(
        params, tokens[:, 16:], positions2[:, 16:], jnp.ones((1, 16), jnp.int32)
    )
    np.testing.assert_allclose(
        np.asarray(out_packed[0, 16:]), np.asarray(out_alone[0]), atol=3e-2
    )


def test_logits_via_embedding():
    cfg, model, params, tokens, positions, segs = _make(["logits_via_embedding=true"])
    logits = model.apply(params, tokens, positions, segs)
    assert logits.shape == (1, 32, cfg.vocab_size)
    # no separate unembedding matrix
    assert "logits_dense" not in params["params"]


def test_remat_policy_names_validated():
    """Unknown remat_policy must raise, not silently become 'save nothing';
    legacy names stay accepted as aliases."""
    import pytest

    from maxtext_indextts2_tpu.models.decoder import _remat_policy

    assert _remat_policy("none") is None
    assert _remat_policy("full") is None
    for legacy in ("save_dot_except_mlp", "save_qkv_proj"):
        assert _remat_policy(legacy) is not None  # alias of save_attn_out
    with pytest.raises(ValueError, match="unknown remat_policy"):
        _remat_policy("save_everything_plz")


def test_vision_encoder_and_fusion():
    from maxtext_indextts2_tpu.models.vision import (
        VisionConfig,
        VisionEncoder,
        merge_vision_embeddings,
    )
    import jax.numpy as jnp

    vcfg = VisionConfig(image_size=28, patch_size=7, hidden_size=32, num_layers=2,
                        num_heads=4, mlp_dim=64, output_dim=16, pool_stride=2,
                        dtype=jnp.float32)
    enc = VisionEncoder(vcfg)
    imgs = jax.random.normal(jax.random.PRNGKey(0), (2, 28, 28, 3))
    params = enc.init(jax.random.PRNGKey(1), imgs)
    out = enc.apply(params, imgs)
    assert out.shape == (2, 4, 16)  # (28/7/2)^2 = 4 tokens

    # fusion: placeholders get vision embeddings in order
    tok_emb = jnp.zeros((1, 6, 16))
    tokens = jnp.array([[5, 99, 99, 7, 99, 8]])
    fused = merge_vision_embeddings(tok_emb, out[:1], tokens, image_token_id=99)
    np.testing.assert_allclose(np.asarray(fused[0, 1]), np.asarray(out[0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused[0, 2]), np.asarray(out[0, 1]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fused[0, 4]), np.asarray(out[0, 2]), atol=1e-6)
    assert np.allclose(np.asarray(fused[0, 0]), 0)
