"""Torch-checkpoint conversion parity tests for the audio stack.

Oracle strategy: the reference's RepCodec / Vocos / acoustic-codec modules
are pure torch and import cleanly, so randomly-initialized reference models
serve as numerical oracles — convert their state dicts with
audio/torch_ckpt.py and require matching outputs. (The reference acoustic
codec's own relative imports are broken — SURVEY.md §7 — so the modules are
loaded into a synthetic package that supplies .quantize/.vocos.)

The S2A DiffLlama oracle can't be imported (it subclasses an older HF Llama
API), so its oracle is rebuilt from current HF Llama blocks (LlamaAttention /
LlamaMLP) plus the adaptive-RMSNorm math — exactly what the reference
denoiser is (llama_nar.py:56 subclasses LlamaDecoderLayer).
"""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference/MaxText/input_pipeline/maskgct"


def load_ref_maskgct():
    """Load reference torch modules as synthetic package ``refmaskgct``.

    Used ONLY as a numerical oracle; loads quantize/vocos first so
    repcodec_model's and acoustic codec.py's relative imports resolve.
    """
    if "refmaskgct" in sys.modules:
        return sys.modules["refmaskgct"]
    pkg = types.ModuleType("refmaskgct")
    pkg.__path__ = [REF]
    sys.modules["refmaskgct"] = pkg
    for name, path in [
        ("quantize", f"{REF}/quantize.py"),
        ("vocos", f"{REF}/vocos.py"),
        ("repcodec_model", f"{REF}/repcodec_model.py"),
        ("codec", f"{REF}/acoustic/codec.py"),
        # DiffLlama/MaskGCT_S2A construct (for state dicts) but can't run a
        # forward under transformers 4.5x — oracle use is state-dict-only.
        ("llama_nar", f"{REF}/s2a/llama_nar.py"),
        ("maskgct_s2a", f"{REF}/s2a/maskgct_s2a.py"),
    ]:
        spec = importlib.util.spec_from_file_location(f"refmaskgct.{name}", path)
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmaskgct.{name}"] = mod
        spec.loader.exec_module(mod)
        setattr(pkg, name, mod)
    return pkg


def test_repcodec_params_from_torch_parity():
    """Reference RepCodec (repcodec_model.py:29) -> our RepCodec: same token
    ids and same reconstruction under converted weights."""
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio.repcodec import RepCodec
    from maxtext_indextts2_tpu.audio.torch_ckpt import repcodec_params_from_torch

    torch.manual_seed(0)
    tm = ref.repcodec_model.RepCodec(
        codebook_size=32, hidden_size=16, codebook_dim=4, vocos_dim=12,
        vocos_intermediate_dim=24, vocos_num_layers=2, num_quantizers=1,
    ).eval()
    # spread the codebook so nearest-neighbor picks are unambiguous
    with torch.no_grad():
        tm.quantizer.quantizers[0].codebook.weight.mul_(4.0)

    x = torch.from_numpy(
        np.random.default_rng(1).standard_normal((2, 9, 16)).astype(np.float32)
    )
    with torch.no_grad():
        x_rec, _, ids = tm(x)
        ids2, quantized = tm.quantize(x)

    ours = RepCodec(
        hidden_size=16, codebook_size=32, codebook_dim=4, vocos_dim=12,
        vocos_intermediate_dim=24, vocos_num_layers=2, num_quantizers=1,
    )
    params = repcodec_params_from_torch(tm.state_dict())
    j_ids = ours.apply(params, jnp.asarray(x.numpy()), method=RepCodec.quantize)
    np.testing.assert_array_equal(np.asarray(j_ids), ids2.numpy())

    j_rec, j_idx, _, _ = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(j_rec), x_rec.numpy(), atol=2e-4, rtol=1e-3)

    # vq2emb round trip matches the torch out-projection path. (The
    # reference ResidualVQ has NO vq2emb — repcodec/codec call a method that
    # doesn't exist, a latent defect like SURVEY.md §7's import break — so
    # the oracle composes the per-quantizer FVQ.vq2emb sum directly.)
    with torch.no_grad():
        t_emb = tm.quantizer.quantizers[0].vq2emb(ids2.long())  # [B, D, T]
    j_emb = ours.apply(params, j_ids, method=RepCodec.vq2emb)
    np.testing.assert_allclose(
        np.asarray(j_emb), t_emb.detach().numpy().transpose(0, 2, 1),
        atol=2e-5, rtol=1e-4,
    )


def test_acoustic_codec_params_from_torch_parity():
    """Reference CodecEncoder/CodecDecoder (acoustic/codec.py:126,195,
    use_vocos=True) -> our acoustic codec under converted weights."""
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio.acoustic import CodecDecoder, CodecEncoder
    from maxtext_indextts2_tpu.audio.torch_ckpt import (
        codec_decoder_params_from_torch,
        codec_encoder_params_from_torch,
    )

    torch.manual_seed(0)
    te = ref.codec.CodecEncoder(d_model=8, up_ratios=[2, 3], out_channels=10).eval()
    wav = np.random.default_rng(2).standard_normal((2, 48)).astype(np.float32)
    with torch.no_grad():
        t_lat = te(torch.from_numpy(wav)[:, None, :])  # [B, C, T']

    je = CodecEncoder(d_model=8, strides=(2, 3), out_channels=10)
    pe = codec_encoder_params_from_torch(te.state_dict(), num_blocks=2)
    j_lat = je.apply(pe, jnp.asarray(wav))  # [B, T', C]
    np.testing.assert_allclose(
        np.asarray(j_lat), t_lat.numpy().transpose(0, 2, 1), atol=2e-5, rtol=1e-4
    )

    td = ref.codec.CodecDecoder(
        in_channels=10, num_quantizers=3, codebook_size=16, codebook_dim=4,
        quantizer_type="fvq", quantizer_dropout=0.0, commitment=0.15,
        codebook_loss_weight=1.0, use_l2_normlize=True, use_vocos=True,
        vocos_dim=12, vocos_intermediate_dim=24, vocos_num_layers=2,
    ).eval()
    with torch.no_grad():
        for q in td.quantizer.quantizers:
            q.codebook.weight.mul_(4.0)
        _, t_ids = td.quantize(t_lat)  # [Q, B, T']
        # reference RVQ lacks vq2emb (defect) — sum the per-quantizer FVQs
        t_emb = sum(
            td.quantizer.quantizers[i].vq2emb(t_ids[i].long())
            for i in range(t_ids.shape[0])
        )  # [B, C, T']
        t_hidden = td.decode(t_emb)  # [B, T', vocos_dim] (backbone output)

    jd = CodecDecoder(
        in_channels=10, num_quantizers=3, codebook_size=16, codebook_dim=4,
        vocos_dim=12, vocos_intermediate_dim=24, vocos_num_layers=2,
        n_fft=12, hop=6,
    )
    init = jd.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 6, 10)), method=CodecDecoder.decode
    )
    conv = codec_decoder_params_from_torch(td.state_dict())
    params = {"params": {**init["params"], **conv["params"]}}

    _, j_ids = jd.apply(params, j_lat, method=CodecDecoder.quantize)
    np.testing.assert_array_equal(np.asarray(j_ids), t_ids.numpy())

    j_emb = jd.apply(params, j_ids, method=CodecDecoder.vq2emb)
    np.testing.assert_allclose(
        np.asarray(j_emb), t_emb.numpy().transpose(0, 2, 1), atol=2e-5, rtol=1e-4
    )

    # the reference decode path stops at backbone hidden states; compare there
    j_hidden = jd.apply(
        params, j_emb, method=lambda m, x: m.backbone(x)
    )
    np.testing.assert_allclose(
        np.asarray(j_hidden), t_hidden.numpy(), atol=2e-4, rtol=1e-3
    )


def test_pipeline_load_torch_audio_weights():
    """TTSPipeline.load_torch_audio_weights ports real reference-module state
    dicts (MaskGCT_S2A instantiated from the reference class itself + the
    acoustic CodecEncoder) and the pipeline still synthesizes end-to-end."""
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio.pipeline import build_tiny_pipeline
    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config([
        "vocab_size=9344", "audio_codebook_size=8192",
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
        "max_target_length=512", "max_prefill_predict_length=128",
        "per_device_batch_size=0.125", "dtype=float32", "decoder_block=tts",
        "s2a_num_quantizers=4", "s2a_hidden_size=64", "s2a_num_layers=2",
        "s2a_num_heads=4", "s2a_codebook_size=64", "s2a_timesteps=[2,2,2,2]",
        "semantic_codebook_size=8192",
    ])
    pl = build_tiny_pipeline(cfg)

    torch.manual_seed(0)
    ts2a = ref.maskgct_s2a.MaskGCT_S2A(
        num_quantizer=4, hidden_size=64, num_layers=2, num_heads=4,
        codebook_size=64, cond_codebook_size=8192,
    )
    tenc = ref.codec.CodecEncoder(d_model=32, up_ratios=[3, 4, 5, 8], out_channels=64)
    pl.load_torch_audio_weights(
        s2a_state_dict=ts2a.state_dict(),
        codec_encoder_state_dict=tenc.state_dict(),
    )
    # ported S2A embeddings really landed
    np.testing.assert_allclose(
        np.asarray(pl.s2a_params["params"]["cond_emb"]),
        ts2a.cond_emb.weight.detach().numpy(), atol=1e-6,
    )

    # drive the ported stages through the pipeline's jitted entry points
    # (the LM is random-init here, so bypass its token-or-not luck)
    rng = np.random.default_rng(2)
    wav24 = rng.standard_normal((1, 24000)).astype(np.float32) * 0.1
    ac_prompt = pl._jit_tok(pl.codec_params, jnp.asarray(wav24))  # [Q,B,T]
    ac_prompt = jnp.transpose(ac_prompt, (1, 2, 0))[:, :10]
    cond = jnp.asarray(rng.integers(0, 8192, (1, 26)), jnp.int32)
    codes = pl._jit_s2a(pl.s2a_params, cond, ac_prompt, jax.random.PRNGKey(0))
    assert codes.shape == (1, 16, 4)
    wav = np.asarray(pl._jit_detok(pl.codec_params, jnp.transpose(codes, (2, 0, 1))))
    assert wav.shape == (1, 16 * 480) and np.isfinite(wav).all()


def test_semantic_tokenizer_load_torch_weights_parity():
    """Full semantic-tokenizer weight port (HF w2v-BERT encoder + stats +
    RepCodec) vs the composed torch oracle (semantic_utils.py:72
    extract_semantic_code: layer tap -> (x-mean)/sqrt(var) -> quantize),
    driven from identical input features."""
    tf = pytest.importorskip("transformers")
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio import mel
    from maxtext_indextts2_tpu.audio.conformer import ConformerConfig, SemanticEncoder
    from maxtext_indextts2_tpu.audio.semantic_tokenizer import SemanticTokenizer

    hf_cfg = tf.Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, feature_projection_input_dim=160,
        conv_depthwise_kernel_size=31, position_embeddings_type="relative_key",
        left_max_position_embeddings=64, right_max_position_embeddings=8,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = tf.Wav2Vec2BertModel(hf_cfg).eval()
    trc = ref.repcodec_model.RepCodec(
        codebook_size=32, hidden_size=32, codebook_dim=4, vocos_dim=12,
        vocos_intermediate_dim=24, vocos_num_layers=2, num_quantizers=1,
    ).eval()
    rng = np.random.default_rng(4)
    stats = {
        "mean": rng.standard_normal(32).astype(np.float32),
        "var": (0.5 + rng.random(32)).astype(np.float32),
    }

    tok = SemanticTokenizer(
        encoder_cfg=ConformerConfig(
            input_dim=160, hidden_size=32, num_layers=3, num_heads=2,
            intermediate_size=48, output_layer=3,
        ),
        repcodec_kwargs=dict(codebook_size=32, codebook_dim=4, vocos_dim=12,
                             vocos_intermediate_dim=24, vocos_num_layers=2,
                             num_quantizers=1),
    )
    tok.load_torch_weights(
        {k: v.numpy() for k, v in hf.state_dict().items()},
        trc.state_dict(), stats,
    )

    wav = rng.standard_normal((1, 16000)).astype(np.float32)
    ids, lens = tok.tokenize(wav, np.array([16000]))
    n = int(lens[0])

    feats, _ = mel.w2vbert_features(jnp.asarray(wav), jnp.array([16000]))
    with torch.no_grad():
        hid = hf(
            torch.from_numpy(np.asarray(feats)), output_hidden_states=True
        ).hidden_states[3]
        normed = (hid - torch.from_numpy(stats["mean"])) / torch.sqrt(
            torch.from_numpy(stats["var"])
        )
        ref_ids, _ = trc.quantize(normed)
    np.testing.assert_array_equal(np.asarray(ids)[0, :n], ref_ids.numpy()[0, :n])


def test_cli_tokenize_with_torch_checkpoints(tmp_path, capsys):
    """audio.cli tokenize loads reference torch checkpoints from disk and
    infers the model dims from the state dicts themselves."""
    import json

    tf = pytest.importorskip("transformers")
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio import cli

    hf_cfg = tf.Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, feature_projection_input_dim=160,
        conv_depthwise_kernel_size=31, position_embeddings_type="relative_key",
        left_max_position_embeddings=64, right_max_position_embeddings=8,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = tf.Wav2Vec2BertModel(hf_cfg).eval()
    trc = ref.repcodec_model.RepCodec(
        codebook_size=32, hidden_size=32, codebook_dim=4, vocos_dim=12,
        vocos_intermediate_dim=24, vocos_num_layers=2, num_quantizers=1,
    ).eval()
    rng = np.random.default_rng(6)
    paths = {
        "w2vbert": tmp_path / "w2vbert.pt",
        "repcodec": tmp_path / "repcodec.pt",
        "stats": tmp_path / "stats.pt",
    }
    torch.save(hf.state_dict(), paths["w2vbert"])
    torch.save(trc.state_dict(), paths["repcodec"])
    torch.save(
        {"mean": torch.zeros(32), "var": torch.ones(32)}, paths["stats"]
    )
    wav_path = tmp_path / "in.npy"
    np.save(wav_path, rng.standard_normal(16000).astype(np.float32))
    out_path = tmp_path / "codes.npy"

    cli.tokenize([
        f"input={wav_path}", f"out={out_path}",
        f"w2vbert={paths['w2vbert']}", f"repcodec={paths['repcodec']}",
        f"stats={paths['stats']}",
    ])
    info = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    codes = np.load(out_path)
    assert info["n_tokens"] == len(codes) > 0
    assert codes.min() >= 0 and codes.max() < 32

    # dims really came from the checkpoints (tap clipped to 3 layers)
    from maxtext_indextts2_tpu.audio.conformer import config_from_hf_state_dict

    cfg = config_from_hf_state_dict(hf.state_dict())
    assert (cfg.hidden_size, cfg.num_layers, cfg.num_heads, cfg.output_layer) == (
        32, 3, 2, 3,
    )


def _ada_norm(h, lin, cond):
    """Reference LlamaAdaptiveRMSNorm math (llama_nar.py:35)."""
    var = h.float().pow(2).mean(-1, keepdim=True)
    hn = h * torch.rsqrt(var + 1e-6)
    w = lin(cond)
    if w.dim() == 2:
        w = w.unsqueeze(1)
    return w * hn


def test_s2a_params_from_torch_parity():
    """S2A converter vs an oracle rebuilt from current HF Llama blocks.

    The reference DiffLlama (llama_nar.py:130) composes HF LlamaDecoderLayer
    attention/MLP with adaptive RMSNorms and cond/diff-step MLPs; its custom
    forward predates transformers 4.5x so the class itself can't run here —
    the oracle below is the same computation on the current API.
    """
    tf = pytest.importorskip("transformers")
    from transformers.models.llama.modeling_llama import (
        LlamaAttention,
        LlamaMLP,
        LlamaRotaryEmbedding,
    )

    from maxtext_indextts2_tpu.audio.s2a import NARDenoiser, S2AConfig, S2AModel
    from maxtext_indextts2_tpu.audio.torch_ckpt import s2a_params_from_torch

    H, N, L, Q, K, CK = 32, 2, 2, 3, 16, 24
    config = tf.LlamaConfig(
        hidden_size=H, num_attention_heads=N, num_key_value_heads=N,
        intermediate_size=4 * H, max_position_embeddings=64,
        attn_implementation="eager", attention_dropout=0.0,
    )
    torch.manual_seed(0)
    attns = [LlamaAttention(config, layer_idx=i).eval() for i in range(L)]
    mlps = [LlamaMLP(config).eval() for _ in range(L)]
    in_norms = [torch.nn.Linear(H, H) for _ in range(L)]
    post_norms = [torch.nn.Linear(H, H) for _ in range(L)]
    final_norm = torch.nn.Linear(H, H)
    c0, c1 = torch.nn.Linear(H, 4 * H), torch.nn.Linear(4 * H, H)
    t0, t1 = torch.nn.Linear(H, 4 * H), torch.nn.Linear(4 * H, H)
    for lin in in_norms + post_norms + [final_norm, c0, c1, t0, t1]:
        torch.nn.init.normal_(lin.weight, std=0.2)
        torch.nn.init.normal_(lin.bias, std=0.2)

    rng = np.random.default_rng(3)
    B, S = 2, 7
    x = torch.from_numpy(rng.standard_normal((B, S, H)).astype(np.float32))
    cond = torch.from_numpy(rng.standard_normal((B, S, H)).astype(np.float32))
    t = torch.from_numpy(np.array([0.3, 0.8], np.float32))

    # ---- torch oracle forward (reference DiffLlama.forward semantics) ----
    import math

    with torch.no_grad():
        half = H // 2
        emb = math.log(10000) / (half - 1)
        freqs = torch.exp(torch.arange(half) * -emb)
        ang = t[:, None] * freqs[None, :]
        t_emb = torch.cat([ang.sin(), ang.cos()], dim=-1)
        t_cond = t1(torch.nn.functional.silu(t0(t_emb)))
        cond_e = c1(torch.nn.functional.silu(c0(cond)))

        h = x + cond_e
        pos = torch.arange(S)[None].expand(B, S)
        rotary = LlamaRotaryEmbedding(config=config)
        cos_sin = rotary(h, pos)
        for i in range(L):
            a, _ = attns[i](
                _ada_norm(h, in_norms[i], t_cond),
                position_embeddings=cos_sin,
                attention_mask=None,
            )
            h = h + a
            h = h + mlps[i](_ada_norm(h, post_norms[i], t_cond))
        ref_out = _ada_norm(h, final_norm, t_cond).numpy()

    # ---- reference-named state dict -> converter -> our denoiser ----
    sd = {
        "layer_emb.weight": rng.standard_normal((Q, H)).astype(np.float32),
        "mask_emb.weight": rng.standard_normal((1, H)).astype(np.float32),
        "cond_emb.weight": rng.standard_normal((CK, H)).astype(np.float32),
    }
    for l in range(Q):
        sd[f"token_emb.{l}.weight"] = rng.standard_normal((K, H)).astype(np.float32)
        sd[f"to_logits.{l}.weight"] = rng.standard_normal((K, H)).astype(np.float32)
        sd[f"to_logits.{l}.bias"] = rng.standard_normal((K,)).astype(np.float32)
    de = "diff_estimator."
    for name, lin in [("cond_mlp.0", c0), ("cond_mlp.2", c1),
                      ("diff_step_mlp.0", t0), ("diff_step_mlp.2", t1),
                      ("norm.to_weight", final_norm)]:
        sd[f"{de}{name}.weight"] = lin.weight.detach().numpy()
        sd[f"{de}{name}.bias"] = lin.bias.detach().numpy()
    for i in range(L):
        pre = f"{de}layers.{i}"
        for pn, mod in [("self_attn.q_proj", attns[i].q_proj),
                        ("self_attn.k_proj", attns[i].k_proj),
                        ("self_attn.v_proj", attns[i].v_proj),
                        ("self_attn.o_proj", attns[i].o_proj),
                        ("mlp.gate_proj", mlps[i].gate_proj),
                        ("mlp.up_proj", mlps[i].up_proj),
                        ("mlp.down_proj", mlps[i].down_proj)]:
            sd[f"{pre}.{pn}.weight"] = mod.weight.detach().numpy()
        for pn, lin in [("input_layernorm.to_weight", in_norms[i]),
                        ("post_attention_layernorm.to_weight", post_norms[i])]:
            sd[f"{pre}.{pn}.weight"] = lin.weight.detach().numpy()
            sd[f"{pre}.{pn}.bias"] = lin.bias.detach().numpy()

    params = s2a_params_from_torch(sd)
    cfg = S2AConfig(num_quantizers=Q, hidden_size=H, num_layers=L, num_heads=N,
                    codebook_size=K, cond_codebook_size=CK)
    ours = NARDenoiser(cfg).apply(
        {"params": params["params"]["denoiser"]},
        jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(cond.numpy()), jnp.ones((B, S), jnp.int32),
    )
    np.testing.assert_allclose(np.asarray(ours), ref_out, atol=3e-5, rtol=1e-4)

    # prefix variant (reference DiffLlamaPrefix, llama_nar.py:355): same
    # blocks, condition CONCATENATED as an attention prefix, output sliced
    from maxtext_indextts2_tpu.audio.s2a import PrefixNARDenoiser
    from maxtext_indextts2_tpu.audio.torch_ckpt import diffllama_params_from_torch

    P = 4
    phone = torch.from_numpy(rng.standard_normal((B, P, H)).astype(np.float32))
    with torch.no_grad():
        cond_e = c1(torch.nn.functional.silu(c0(phone)))
        h = torch.cat([cond_e, x], dim=1)
        pos_p = torch.arange(P + S)[None].expand(B, P + S)
        cos_sin_p = rotary(h, pos_p)
        for i in range(L):
            a, _ = attns[i](
                _ada_norm(h, in_norms[i], t_cond),
                position_embeddings=cos_sin_p,
                attention_mask=None,
            )
            h = h + a
            h = h + mlps[i](_ada_norm(h, post_norms[i], t_cond))
        ref_prefix = _ada_norm(h, final_norm, t_cond).numpy()[:, P:]

    sd_plain = {k.removeprefix("diff_estimator."): v for k, v in sd.items()
                if k.startswith("diff_estimator.")}
    pd = diffllama_params_from_torch(sd_plain)
    ours_prefix = PrefixNARDenoiser(cfg).apply(
        pd, jnp.asarray(x.numpy()), jnp.asarray(t.numpy()),
        jnp.asarray(phone.numpy()),
    )
    np.testing.assert_allclose(
        np.asarray(ours_prefix), ref_prefix, atol=3e-5, rtol=1e-4
    )

    # full-tree smoke: converted embeddings/heads drive compute_loss
    model = S2AModel(cfg)
    x0 = jnp.asarray(rng.integers(0, K, (B, S, Q)), jnp.int32)
    cc = jnp.asarray(rng.integers(0, CK, (B, S)), jnp.int32)
    loss, _ = model.apply(
        params, x0, jnp.ones((B, S), jnp.int32), cc, jax.random.PRNGKey(0),
        method=S2AModel.compute_loss,
    )
    assert np.isfinite(float(loss))


def test_pipeline_rejects_mismatched_s2a_checkpoint():
    """load_torch_audio_weights validates checkpoint dims BEFORE loading:
    flax silently ignores surplus per-layer params, so a larger checkpoint
    would otherwise run truncated and produce garbage."""
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio.pipeline import build_tiny_pipeline
    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config([
        "vocab_size=9344", "audio_codebook_size=8192",
        "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
        "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
        "max_target_length=512", "max_prefill_predict_length=128",
        "per_device_batch_size=0.125", "dtype=float32", "decoder_block=tts",
        "s2a_num_quantizers=4", "s2a_hidden_size=64", "s2a_num_layers=2",
        "s2a_num_heads=4", "s2a_codebook_size=64", "s2a_timesteps=[2,2,2,2]",
        "semantic_codebook_size=8192",
    ])
    pl = build_tiny_pipeline(cfg)
    torch.manual_seed(1)
    # 4 layers in the checkpoint vs 2 configured -> must raise, not truncate
    big = ref.maskgct_s2a.MaskGCT_S2A(
        num_quantizer=4, hidden_size=64, num_layers=4, num_heads=4,
        codebook_size=64, cond_codebook_size=8192,
    )
    with pytest.raises(ValueError, match="S2A checkpoint dims"):
        pl.load_torch_audio_weights(s2a_state_dict=big.state_dict())


def test_conv_decoder_variant_matches_torch():
    """CodecDecoder use_vocos=False (DAC-style transposed-conv decoder,
    codec.py:303-324) parity: the UpsampleConv input-dilated formulation
    must reproduce torch ConvTranspose1d exactly, end-to-end to waveform."""
    ref = load_ref_maskgct()
    from maxtext_indextts2_tpu.audio.acoustic import CodecDecoder
    from maxtext_indextts2_tpu.audio.torch_ckpt import (
        codec_decoder_kwargs_from_torch,
        codec_decoder_params_from_torch,
    )

    torch.manual_seed(3)
    td = ref.codec.CodecDecoder(
        in_channels=10, upsample_initial_channel=16, up_ratios=[2, 3],
        num_quantizers=2, codebook_size=16, codebook_dim=4,
        quantizer_type="fvq", quantizer_dropout=0.0, commitment=0.15,
        codebook_loss_weight=1.0, use_l2_normlize=True, use_vocos=False,
    ).eval()

    kwargs = codec_decoder_kwargs_from_torch(td.state_dict())
    assert kwargs["use_vocos"] is False
    assert kwargs["up_ratios"] == (2, 3)
    assert kwargs["upsample_initial_channel"] == 16

    jd = CodecDecoder(**kwargs)
    params = codec_decoder_params_from_torch(td.state_dict())

    emb = np.random.default_rng(5).standard_normal((2, 7, 10)).astype(np.float32)
    with torch.no_grad():
        t_wav = td.decode(torch.from_numpy(emb.transpose(0, 2, 1)))  # [B,1,T*6]
    j_wav = jd.apply(params, jnp.asarray(emb), method=CodecDecoder.decode)
    assert j_wav.shape == (2, 7 * 6)
    np.testing.assert_allclose(
        np.asarray(j_wav), t_wav.numpy()[:, 0, :], atol=2e-5, rtol=1e-4
    )

    # quantize/vq2emb work identically through the shared RVQ
    with torch.no_grad():
        for q in td.quantizer.quantizers:
            q.codebook.weight.mul_(4.0)
        lat = torch.from_numpy(emb.transpose(0, 2, 1))
        _, t_ids = td.quantize(lat)
    params = codec_decoder_params_from_torch(td.state_dict())
    _, j_ids = jd.apply(params, jnp.asarray(emb), method=CodecDecoder.quantize)
    np.testing.assert_array_equal(np.asarray(j_ids), t_ids.numpy())
