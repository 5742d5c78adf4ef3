"""MLA (DeepSeek latent attention) decode parity test."""

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import MODE_AUTOREGRESSIVE, MODE_PREFILL, Transformer


def test_mla_decode_parity():
    cfg = load_config(
        [
            "decoder_block=deepseek",
            "base_emb_dim=64",
            "base_mlp_dim=128",
            "base_num_decoder_layers=2",
            "base_num_query_heads=4",
            "base_num_kv_heads=4",
            "q_lora_rank=32",
            "kv_lora_rank=32",
            "qk_nope_head_dim=32",
            "qk_rope_head_dim=16",
            "v_head_dim=32",
            "num_experts=1",
            "vocab_size=256",
            "max_target_length=32",
            "scan_layers=false",
            "dtype=float32",
        ]
    )
    model = Transformer(cfg=cfg)
    S, P = 32, 8
    key = jax.random.PRNGKey(0)
    tokens = jax.random.randint(key, (1, S), 0, cfg.vocab_size)
    positions = jnp.arange(S)[None, :]
    segs = jnp.ones((1, S), jnp.int32)
    params = model.init(key, tokens, positions, segs)

    full = model.apply(params, tokens, positions, segs)
    pre, vars_ = model.apply(
        params, tokens[:, :P], positions[:, :P], segs[:, :P],
        mode=MODE_PREFILL, mutable=["cache"],
    )
    np.testing.assert_allclose(np.asarray(pre[0, :P]), np.asarray(full[0, :P]), atol=1e-4)
    cache = vars_["cache"]
    for i in range(P, P + 3):
        ar, vars_ = model.apply(
            {**params, "cache": cache},
            tokens[:, i : i + 1], positions[:, i : i + 1], jnp.ones((1, 1), jnp.int32),
            mode=MODE_AUTOREGRESSIVE, mutable=["cache"],
        )
        cache = vars_["cache"]
        np.testing.assert_allclose(np.asarray(ar[0, 0]), np.asarray(full[0, i]), atol=1e-4)
