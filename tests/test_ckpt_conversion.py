"""HF->framework conversion: logits parity against the actual HF torch
forward (reference: forward_pass_logit_checker.py golden-logit strategy,
self-contained with a tiny randomly-initialized HF model)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.utils.ckpt_conversion import (
    convert_framework_to_hf_llama,
    convert_hf_llama_to_framework,
)


def _tiny_hf_llama():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=128,
        rope_theta=10000.0,
        rms_norm_eps=1e-6,
        attention_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return LlamaForCausalLM(hf_cfg)


@pytest.fixture(scope="module")
def setup():
    hf = _tiny_hf_llama().eval()
    cfg = load_config([
        "decoder_block=llama2",
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=256", "max_target_length=32",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_llama_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}
    return hf, cfg, params


def test_logits_parity_with_hf(setup):
    hf, cfg, params = setup
    model = Transformer(cfg=cfg)

    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()

    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))

    # same argmax everywhere and close logits
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_roundtrip_hf_framework_hf(setup):
    hf, cfg, params = setup
    sd = convert_framework_to_hf_llama(params, cfg)
    ref_sd = hf.state_dict()
    for k, v in sd.items():
        np.testing.assert_allclose(
            np.asarray(v), ref_sd[k].float().numpy(), atol=1e-6, err_msg=k
        )


def test_gemma2_logits_parity():
    """Gemma2 family (sandwich norms, softcaps, alternating sliding/global,
    tied embeddings) converts with logits parity vs HF torch."""
    from transformers import Gemma2Config, Gemma2ForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_gemma2_to_framework,
    )

    hf_cfg = Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        attn_logit_softcapping=50.0, final_logit_softcapping=30.0,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = Gemma2ForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=gemma2", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=4", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "sliding_window_size=8",
        "attn_logits_soft_cap=50.0", "final_logits_soft_cap=30.0",
        "query_pre_attn_scalar=16",
        "logits_via_embedding=true", "normalize_embedding_logits=false",
        "mlp_activations=[gelu,linear]",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_gemma2_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_mixtral_logits_parity():
    """Mixtral MoE conversion: stacked expert weights + renormalized top-k
    routing; logits parity vs HF MixtralForCausalLM."""
    from transformers import MixtralConfig, MixtralForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_mixtral_to_framework,
    )

    hf_cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = MixtralForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=mixtral", "base_emb_dim=64", "base_mlp_dim=128",
        "moe_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=256", "max_target_length=32",
        "num_experts=4", "num_experts_per_tok=2", "normalize_topk_weights=true",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_mixtral_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    # dense-path all-expert compute reorders fp ops vs HF's per-expert
    # gather; argmax identical, values within 1e-2
    assert np.abs(ref - ours).max() < 1e-2


def test_qwen3_logits_parity():
    """Qwen3 (qk-norms, untied head) via the llama-family converter."""
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = Qwen3ForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=qwen3", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "dtype=float32", "weight_dtype=float32",
        "attention=dot_product",
    ])
    params = convert_hf_llama_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_deepseek_mla_logits_parity():
    """DeepSeek V3 dense layers: MLA conversion parity vs HF torch."""
    from transformers import DeepseekV3Config, DeepseekV3ForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_deepseek_to_framework,
    )

    hf_cfg = DeepseekV3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        q_lora_rank=32, kv_lora_rank=32, qk_nope_head_dim=32,
        qk_rope_head_dim=16, v_head_dim=32,
        first_k_dense_replace=2,  # all layers dense
        n_routed_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_interleave=True, tie_word_embeddings=False,
        attention_bias=False, rope_scaling=None,
    )
    torch.manual_seed(0)
    hf = DeepseekV3ForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=deepseek", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=4", "q_lora_rank=32", "kv_lora_rank=32",
        "qk_nope_head_dim=32", "qk_rope_head_dim=16", "v_head_dim=32",
        "num_experts=1", "vocab_size=256", "max_target_length=32",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_deepseek_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_gemma3_logits_parity():
    """Gemma3 (5 sliding : 1 global pattern, qk-norms, sandwich norms)."""
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_gemma3_to_framework,
    )

    hf_cfg = Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        max_position_embeddings=128, rope_theta=10000.0,
        rope_local_base_freq=10000.0, tie_word_embeddings=True,
        attn_logit_softcapping=None, final_logit_softcapping=None,
        rope_scaling=None,
    )
    torch.manual_seed(0)
    hf = Gemma3ForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=gemma3", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=6", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "sliding_window_size=8",
        "query_pre_attn_scalar=16",
        "logits_via_embedding=true", "normalize_embedding_logits=false",
        "mlp_activations=[gelu,linear]",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_gemma3_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_gemma1_logits_parity():
    """Gemma v1: (1+w) norms, sqrt(d) embedding scale, gelu, tied unembed —
    all via decoder_block=gemma family defaults (no extra flags)."""
    from transformers import GemmaConfig, GemmaForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_gemma_to_framework,
    )

    hf_cfg = GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        hidden_act="gelu_pytorch_tanh", tie_word_embeddings=True,
    )
    torch.manual_seed(0)
    hf = GemmaForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=gemma", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=3", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_gemma_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_gpt2_logits_parity():
    """GPT-2 -> gpt3 family: LayerNorm (mean+bias), fused-qkv split, attn/MLP
    biases, learned positions, tied unembedding."""
    from transformers import GPT2Config, GPT2LMHeadModel

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_gpt2_to_framework,
    )

    hf_cfg = GPT2Config(
        vocab_size=256, n_positions=64, n_embd=64, n_layer=3, n_head=4,
        activation_function="gelu_new", tie_word_embeddings=True,
        attn_pdrop=0.0, embd_pdrop=0.0, resid_pdrop=0.0,
    )
    torch.manual_seed(0)
    hf = GPT2LMHeadModel(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=gpt3", "base_emb_dim=64", "base_mlp_dim=256",
        "base_num_decoder_layers=3", "base_num_query_heads=4",
        "base_num_kv_heads=4", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "normalization_layer_epsilon=1e-5",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_gpt2_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_llama4_logits_parity():
    """Llama4 text: chunked+NoPE attention pattern, post-rope L2 qk-norm,
    temperature-tuned NoPE q, sigmoid top-1 MoE with input weighting +
    shared expert."""
    from transformers import Llama4ForCausalLM, Llama4TextConfig

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_llama4_to_framework,
    )

    hf_cfg = Llama4TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        intermediate_size_mlp=160, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=1, attention_chunk_size=8,
        rope_theta=10000.0, use_qk_norm=True, attn_temperature_tuning=True,
        attention_bias=False, tie_word_embeddings=False, rope_scaling=None,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    hf = Llama4ForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=llama4", "base_emb_dim=64", "base_mlp_dim=160",
        "moe_mlp_dim=128", "base_num_decoder_layers=4",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=256", "max_target_length=32", "chunk_attn_window_size=8",
        "num_experts=4", "num_experts_per_tok=1", "sparse_matmul=false",
        "rope_max_timescale=10000", "normalization_layer_epsilon=1e-5",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_llama4_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_siglip_vision_tower_parity():
    """Gemma3's vision tower: converted SiglipVisionModel must reproduce
    last_hidden_state through VisionEncoder (pool/projector disabled)."""
    from transformers import SiglipVisionConfig, SiglipVisionModel

    from maxtext_indextts2_tpu.models.vision import VisionConfig, VisionEncoder
    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_siglip_to_framework,
    )

    hf_cfg = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        hidden_act="gelu_pytorch_tanh", layer_norm_eps=1e-6,
    )
    torch.manual_seed(0)
    hf = SiglipVisionModel(hf_cfg).eval()

    vcfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=64, num_layers=2,
        num_heads=4, mlp_dim=128, output_dim=0, pool_stride=1,
        dtype=jnp.float32,
    )
    params = convert_hf_siglip_to_framework(hf.state_dict(), num_layers=2)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    ours = np.asarray(VisionEncoder(vcfg).apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(ref, ours, atol=2e-4)


def test_gemma3_multimodal_logits_parity():
    """End-to-end gemma3 multimodal: pixels -> SigLIP tower -> projector ->
    vision tokens fused into the text stream; logits parity vs HF
    Gemma3ForConditionalGeneration."""
    from transformers import (
        Gemma3Config,
        Gemma3ForConditionalGeneration,
        Gemma3TextConfig,
        SiglipVisionConfig,
    )

    from maxtext_indextts2_tpu.models.vision import (
        Gemma3MultiModalProjector,
        VisionConfig,
        VisionEncoder,
    )
    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_gemma3_multimodal,
    )

    tc = Gemma3TextConfig(
        vocab_size=260, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        rope_local_base_freq=10000.0, sliding_window=8,
        query_pre_attn_scalar=16, attn_logit_softcapping=None,
        final_logit_softcapping=None, tie_word_embeddings=True,
    )
    vc = SiglipVisionConfig(
        hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=28, patch_size=14,
        layer_norm_eps=1e-6,
    )
    hf_cfg = Gemma3Config(
        text_config=tc, vision_config=vc, mm_tokens_per_image=1,
        image_token_index=259, boi_token_index=257, eoi_token_index=258,
    )
    torch.manual_seed(0)
    hf = Gemma3ForConditionalGeneration(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=gemma3", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=6", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=260",
        "max_target_length=32", "sliding_window_size=8",
        "query_pre_attn_scalar=16", "image_token_id=259",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    text, vision, projector = convert_hf_gemma3_multimodal(
        hf.state_dict(), cfg, vision_num_layers=2
    )
    asjnp = lambda p: {"params": jax.tree.map(jnp.asarray, p["params"])}
    text, vision, projector = asjnp(text), asjnp(vision), asjnp(projector)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 28, 28, 3)).astype(np.float32)
    tokens = rng.integers(0, 256, size=(2, 12)).astype(np.int32)
    tokens[:, 3] = 259  # one image token per row

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        ).logits.numpy()

    vcfg = VisionConfig(
        image_size=28, patch_size=14, hidden_size=64, num_layers=2,
        num_heads=4, mlp_dim=128, output_dim=0, pool_stride=1,
        dtype=jnp.float32,
    )
    tower_out = VisionEncoder(vcfg).apply(vision, jnp.asarray(imgs))
    soft = Gemma3MultiModalProjector(
        vision_hidden=64, text_hidden=64, patches_per_side=2,
        tokens_per_side=1, eps=1e-6,
    ).apply(projector, tower_out)

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    positions = jnp.broadcast_to(jnp.arange(12), (2, 12))
    segs = jnp.ones((2, 12), jnp.int32)
    ours = np.asarray(model.apply(
        text, jnp.asarray(tokens), positions, segs, vision_embeddings=soft,
    ))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_llama4_vision_tower_parity():
    """Llama4 vision tower: unfold patch embed, end-CLS, 2D rope, exact-erf
    GELU, pixel-shuffle adapter — last_hidden_state parity vs HF."""
    from transformers import Llama4VisionConfig
    from transformers.models.llama4.modeling_llama4 import Llama4VisionModel

    from maxtext_indextts2_tpu.models.vision import Llama4VisionEncoder
    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_llama4_vision_to_framework,
    )

    vc = Llama4VisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8,
        pixel_shuffle_ratio=0.5, projector_input_dim=64,
        projector_output_dim=64, vision_output_dim=64, rope_theta=10000,
        projector_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = Llama4VisionModel(vc).eval()
    enc = Llama4VisionEncoder(
        image_size=16, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=128, projector_input_dim=64,
        projector_output_dim=64, pixel_shuffle_ratio=0.5, rope_theta=10000,
    )
    params = convert_hf_llama4_vision_to_framework(hf.state_dict(), 2)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    with torch.no_grad():
        ref = hf(
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()
    ours = np.asarray(enc.apply(params, jnp.asarray(imgs)))
    np.testing.assert_allclose(ref, ours, atol=2e-5)


def test_llama4_multimodal_logits_parity():
    """End-to-end llama4 multimodal: pixels -> vision tower (2D rope, pixel
    shuffle) -> linear projector -> fused into the MoE text stream."""
    from transformers import (
        Llama4Config,
        Llama4ForConditionalGeneration,
        Llama4TextConfig,
        Llama4VisionConfig,
    )

    from maxtext_indextts2_tpu.models.vision import Llama4VisionEncoder
    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_llama4_multimodal,
    )

    tc = Llama4TextConfig(
        vocab_size=260, hidden_size=64, intermediate_size=128,
        intermediate_size_mlp=160, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_local_experts=4, num_experts_per_tok=1,
        interleave_moe_layer_step=1, attention_chunk_size=8,
        rope_theta=10000.0, use_qk_norm=True, attn_temperature_tuning=True,
        attention_bias=False, tie_word_embeddings=False, rope_scaling=None,
        max_position_embeddings=128,
    )
    vc = Llama4VisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, image_size=16, patch_size=8,
        pixel_shuffle_ratio=0.5, projector_input_dim=64,
        projector_output_dim=64, vision_output_dim=64, rope_theta=10000,
        projector_dropout=0.0,
    )
    hf_cfg = Llama4Config(
        text_config=tc, vision_config=vc, image_token_index=259,
        boi_token_index=257, eoi_token_index=258,
    )
    torch.manual_seed(0)
    hf = Llama4ForConditionalGeneration(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=llama4", "base_emb_dim=64", "base_mlp_dim=160",
        "moe_mlp_dim=128", "base_num_decoder_layers=4",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=260", "max_target_length=32", "chunk_attn_window_size=8",
        "num_experts=4", "num_experts_per_tok=1", "sparse_matmul=false",
        "rope_max_timescale=10000", "normalization_layer_epsilon=1e-5",
        "image_token_id=259",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    text, vision, projector = convert_hf_llama4_multimodal(
        hf.state_dict(), cfg, vision_num_layers=2
    )
    asjnp = lambda p: {"params": jax.tree.map(jnp.asarray, p["params"])}
    text, vision, projector = asjnp(text), asjnp(vision), asjnp(projector)

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((2, 16, 16, 3)).astype(np.float32)
    tokens = rng.integers(0, 256, size=(2, 12)).astype(np.int32)
    tokens[:, 3] = 259  # one image soft token per row (1 patch after shuffle)

    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(tokens.astype(np.int64)),
            pixel_values=torch.from_numpy(imgs.transpose(0, 3, 1, 2)),
        ).logits.numpy()

    enc = Llama4VisionEncoder(
        image_size=16, patch_size=8, hidden_size=32, num_layers=2,
        num_heads=4, intermediate_size=128, projector_input_dim=64,
        projector_output_dim=64, pixel_shuffle_ratio=0.5, rope_theta=10000,
    )
    tower = enc.apply(vision, jnp.asarray(imgs))
    soft = tower @ projector["params"]["kernel"]

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    positions = jnp.broadcast_to(jnp.arange(12), (2, 12))
    segs = jnp.ones((2, 12), jnp.int32)
    ours = np.asarray(model.apply(
        text, jnp.asarray(tokens), positions, segs, vision_embeddings=soft,
    ))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_qwen3_moe_logits_parity():
    """Qwen3-MoE: per-head q/k norms + softmax top-k routing with
    renormalized weights; logits parity vs HF Qwen3MoeForCausalLM."""
    from transformers import Qwen3MoeConfig, Qwen3MoeForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_qwen3_moe_to_framework,
    )

    hf_cfg = Qwen3MoeConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        moe_intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        num_experts=4, num_experts_per_tok=2, norm_topk_prob=True,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=False, decoder_sparse_step=1, mlp_only_layers=[],
    )
    torch.manual_seed(0)
    hf = Qwen3MoeForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=qwen3", "base_emb_dim=64", "base_mlp_dim=128",
        "moe_mlp_dim=96", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=256", "max_target_length=32", "num_experts=4",
        "num_experts_per_tok=2", "normalize_topk_weights=true",
        "sparse_matmul=false", "rope_max_timescale=10000",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_qwen3_moe_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 1e-2  # dense all-expert fp reorder


def test_mistral_logits_parity():
    """Mistral: llama layout + sliding-window attention."""
    from transformers import MistralConfig, MistralForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_hf_llama_to_framework,
    )

    hf_cfg = MistralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=8, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = MistralForCausalLM(hf_cfg).eval()

    cfg = load_config([
        "decoder_block=mistral", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "sliding_window_size=8",
        "rope_max_timescale=10000",
        "dtype=float32", "weight_dtype=float32", "attention=dot_product",
    ])
    params = convert_hf_llama_to_framework(hf.state_dict(), cfg)
    params = {"params": jax.tree.map(jnp.asarray, params["params"])}

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(tokens.astype(np.int64))).logits.numpy()
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    segs = jnp.ones((2, 16), jnp.int32)
    ours = np.asarray(model.apply(params, jnp.asarray(tokens), positions, segs))
    np.testing.assert_array_equal(ref.argmax(-1), ours.argmax(-1))
    assert np.abs(ref - ours).max() < 2e-3


def test_mixtral_roundtrip_hf_framework_hf():
    """framework -> HF export for Mixtral (reference
    llama_mistral_mixtral_orbax_to_hf direction): exact round trip of every
    tensor including stacked expert weights."""
    from transformers import MixtralConfig, MixtralForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_framework_to_hf_mixtral,
        convert_hf_mixtral_to_framework,
    )

    hf_cfg = MixtralConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, rope_theta=10000.0,
        sliding_window=None, tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    hf = MixtralForCausalLM(hf_cfg).eval()
    cfg = load_config([
        "decoder_block=mixtral", "base_emb_dim=64", "base_mlp_dim=128",
        "moe_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=256", "max_target_length=32",
        "num_experts=4", "num_experts_per_tok=2",
        "dtype=float32", "weight_dtype=float32",
    ])
    params = convert_hf_mixtral_to_framework(hf.state_dict(), cfg)
    sd = convert_framework_to_hf_mixtral(params, cfg)
    ref_sd = hf.state_dict()
    missing = {k for k in ref_sd if k not in sd and "rotary" not in k}
    assert not missing, missing
    for k, v in sd.items():
        np.testing.assert_allclose(
            np.asarray(v), ref_sd[k].float().numpy(), atol=1e-6, err_msg=k
        )


def test_gemma2_gemma3_qwen3_roundtrip_to_hf():
    """framework -> HF exports for gemma2/gemma3/qwen3 (the reference
    to_huggingface.py family list): exact tensor round trips."""
    from transformers import (
        Gemma2Config, Gemma2ForCausalLM, Gemma3ForCausalLM, Gemma3TextConfig,
        Qwen3Config, Qwen3ForCausalLM,
    )

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_framework_to_hf_gemma2,
        convert_framework_to_hf_gemma3,
        convert_framework_to_hf_llama,
        convert_hf_gemma2_to_framework,
        convert_hf_gemma3_to_framework,
        convert_hf_llama_to_framework,
    )

    def check(hf, params, export, cfg, tied):
        sd = export(params, cfg)
        ref_sd = {k: v for k, v in hf.state_dict().items() if "rotary" not in k}
        if tied:
            ref_sd.pop("lm_head.weight", None)
        missing = set(ref_sd) - set(sd)
        assert not missing, missing
        for k, v in sd.items():
            np.testing.assert_allclose(
                np.asarray(v), ref_sd[k].float().numpy(), atol=1e-6, err_msg=k
            )

    torch.manual_seed(2)
    hf2 = Gemma2ForCausalLM(Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        tie_word_embeddings=True,
    )).eval()
    cfg2 = load_config([
        "decoder_block=gemma2", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=4", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "logits_via_embedding=true",
    ])
    check(hf2, convert_hf_gemma2_to_framework(hf2.state_dict(), cfg2),
          convert_framework_to_hf_gemma2, cfg2, tied=True)

    hf3 = Gemma3ForCausalLM(Gemma3TextConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=6, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, query_pre_attn_scalar=16, sliding_window=8,
        tie_word_embeddings=True, rope_scaling=None,
    )).eval()
    cfg3 = load_config([
        "decoder_block=gemma3", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=6", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "logits_via_embedding=true",
    ])
    check(hf3, convert_hf_gemma3_to_framework(hf3.state_dict(), cfg3),
          convert_framework_to_hf_gemma3, cfg3, tied=True)

    hfq = Qwen3ForCausalLM(Qwen3Config(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, tie_word_embeddings=False,
    )).eval()
    cfgq = load_config([
        "decoder_block=qwen3", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32",
    ])
    check(hfq, convert_hf_llama_to_framework(hfq.state_dict(), cfgq),
          convert_framework_to_hf_llama, cfgq, tied=False)


def test_cli_roundtrip_both_directions(tmp_path):
    """ckpt_conversion CLI: HF dir -> Orbax params-only -> HF export, exact
    tensors back (to_framework + to_hf directions, family dispatch)."""
    from maxtext_indextts2_tpu.utils import ckpt_conversion as cc

    hf = _tiny_hf_llama().eval()
    hf_dir = tmp_path / "hf"
    hf.save_pretrained(hf_dir)
    # tokenizer-free dir: AutoModel only needs config + weights

    ckpt = tmp_path / "orbax"
    out = tmp_path / "export"
    # model preset: reuse llama2-7b family block with tiny dims via CLI keys?
    # The CLI takes model_name only, so monkeypatch load_config inputs by
    # pointing at a real preset is impractical for tiny dims — call the
    # internals the CLI composes instead, then the CLI's to_hf path.
    from maxtext_indextts2_tpu.train.checkpointing import save_params_only

    cfg = load_config([
        "decoder_block=llama2", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=32",
    ])
    conv = cc.get_converter("llama2", "to_framework")
    params = conv(hf.state_dict(), cfg)
    save_params_only(str(ckpt), params["params"])

    from maxtext_indextts2_tpu.train.checkpointing import load_params_only

    restored = load_params_only(str(ckpt))
    sd = cc.get_converter("llama2", "to_hf")({"params": restored}, cfg)
    ref_sd = hf.state_dict()
    for k, v in sd.items():
        np.testing.assert_allclose(
            np.asarray(v), ref_sd[k].float().numpy(), atol=1e-6, err_msg=k
        )

    # unsupported export direction raises a clear error
    with pytest.raises(ValueError, match="no to_hf converter|has no to_hf"):
        cc.get_converter("deepseek", "to_hf")
    with pytest.raises(ValueError, match="no converters"):
        cc.get_converter("nope", "to_hf")


def test_export_dir_loads_with_from_pretrained(tmp_path):
    """to_hf output (pytorch_model.bin + emitted config.json) round-trips
    through AutoModelForCausalLM.from_pretrained with identical logits."""
    import os

    from transformers import AutoModelForCausalLM

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        convert_framework_to_hf_llama,
        convert_hf_llama_to_framework,
        hf_config_for,
    )

    hf = _tiny_hf_llama().eval()
    cfg = load_config([
        "decoder_block=llama2", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=16", "vocab_size=256",
        "max_target_length=128",
    ])
    params = convert_hf_llama_to_framework(hf.state_dict(), cfg)
    sd = convert_framework_to_hf_llama(params, cfg)

    out = tmp_path / "export"
    os.makedirs(out)
    torch.save({k: torch.from_numpy(np.ascontiguousarray(v))
                for k, v in sd.items()}, out / "pytorch_model.bin")
    hf_config_for(cfg).save_pretrained(out)

    loaded = AutoModelForCausalLM.from_pretrained(out).eval()
    tokens = torch.arange(12)[None]
    with torch.no_grad():
        ref = hf(tokens).logits
        got = loaded(tokens).logits
    np.testing.assert_allclose(got.numpy(), ref.numpy(), atol=1e-5)


def test_hf_config_for_families():
    """hf_config_for emits a loadable transformers config for exportable
    families and None for framework-only blocks."""
    from maxtext_indextts2_tpu.utils.ckpt_conversion import hf_config_for

    base = [
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=256", "max_target_length=128",
    ]
    cases = {
        "llama2": "LlamaConfig",
        "mistral": "MistralConfig",
        "qwen3": "Qwen3Config",
        "gemma2": "Gemma2Config",
        "gemma3": "Gemma3TextConfig",
    }
    for block, cls in cases.items():
        cfg = load_config(base + [f"decoder_block={block}"])
        hf_cfg = hf_config_for(cfg)
        assert type(hf_cfg).__name__ == cls, (block, type(hf_cfg))
        assert hf_cfg.hidden_size == 64 and hf_cfg.num_hidden_layers == 2

    mix = load_config(base + ["decoder_block=mixtral", "num_experts=4",
                              "num_experts_per_tok=2"])
    hf_mix = hf_config_for(mix)
    assert hf_mix.num_local_experts == 4 and hf_mix.num_experts_per_tok == 2

    tts = load_config(base + ["decoder_block=tts", "audio_codebook_size=64",
                              "semantic_codebook_size=64"])
    assert hf_config_for(tts) is None


def test_paxml_gpt3_golden_shapes(tmp_path):
    """paxml-format GPT-3 import (reference convert_gpt3_ckpt_from_paxml.py):
    synthesize a paxml `state` directory with the reference's tensorstore
    layout (zarr arrays in dirs literally named mdl_vars.params.lm...),
    load it, and require the converted tree to match the gpt3 family's
    init-shape tree exactly — then run a forward pass on it."""
    import tensorstore as ts

    from maxtext_indextts2_tpu.utils.ckpt_conversion import (
        load_paxml_gpt3_checkpoint,
    )

    cfg = load_config([
        "decoder_block=gpt3", "base_emb_dim=64", "base_mlp_dim=256",
        "base_num_decoder_layers=3", "base_num_query_heads=4",
        "base_num_kv_heads=4", "head_dim=16", "vocab_size=256",
        "max_target_length=32", "dtype=float32", "weight_dtype=float32",
        "attention=dot_product",
    ])
    L, E, M = 3, 64, 256
    nq, hd = 4, 16
    V, S = 256, 32
    rng = np.random.default_rng(7)
    P = ".params.lm"
    X = P + ".transformer.repeat.sub.x_layers_0"
    pax = {
        f"{X}.self_attention.combined_qkv.w": (L, 3, E, nq, hd),
        f"{X}.self_attention.combined_qkv.b": (L, 3, nq, hd),
        f"{X}.self_attention.post.w": (L, E, nq, hd),
        f"{X}.self_attention.post.b": (L, E),
        f"{X}.ff_layer.ffn_layer1.linear.w": (L, E, M),
        f"{X}.ff_layer.ffn_layer1.bias.b": (L, M),
        f"{X}.ff_layer.ffn_layer2.linear.w": (L, M, E),
        f"{X}.ff_layer.ffn_layer2.bias.b": (L, E),
        f"{X}.layer_norm.scale": (L, E),
        f"{X}.layer_norm.bias": (L, E),
        f"{X}.ff_layer.layer_norm.scale": (L, E),
        f"{X}.ff_layer.layer_norm.bias": (L, E),
        f"{P}.softmax.logits_ffn.linear.w": (E, V),
        f"{P}.position_emb.emb_var": (S, E),
        f"{P}.final_ln.scale": (E,),
        f"{P}.final_ln.bias": (E,),
    }
    for name, shape in pax.items():
        arr = (rng.standard_normal(shape) * 0.02).astype(np.float32)
        spec = {
            "driver": "zarr", "metadata_key": ".zarray",
            "kvstore": {"driver": "file",
                        "path": str(tmp_path / f"mdl_vars{name}")},
            "metadata": {"shape": list(shape), "dtype": "<f4"},
            "create": True,
        }
        ts.open(ts.Spec(spec)).result().write(arr).result()

    params = load_paxml_gpt3_checkpoint(str(tmp_path), cfg)

    from maxtext_indextts2_tpu.models import Transformer

    model = Transformer(cfg=cfg)
    dummy = jnp.zeros((1, 16), jnp.int32)
    from flax import linen as nn

    want = nn.meta.unbox(jax.eval_shape(
        lambda r: model.init(r, dummy, dummy, dummy), jax.random.PRNGKey(0)
    )["params"])
    got = params["params"]
    want_shapes = jax.tree.map(lambda x: tuple(x.shape), want)
    got_shapes = jax.tree.map(lambda x: tuple(np.shape(x)), got)
    assert want_shapes == got_shapes, (
        f"converted tree differs from model init:\n{got_shapes}\nvs\n{want_shapes}"
    )

    params = {"params": jax.tree.map(jnp.asarray, got)}
    tokens = jnp.asarray(rng.integers(0, V, size=(2, 16)), jnp.int32)
    positions = jnp.broadcast_to(jnp.arange(16), (2, 16))
    logits = model.apply(params, tokens, positions, jnp.ones((2, 16), jnp.int32))
    assert logits.shape == (2, 16, V)
    assert np.isfinite(np.asarray(logits)).all()
