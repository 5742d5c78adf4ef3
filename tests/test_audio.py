"""Audio stack tests: mel parity vs the reference front-end, conformer,
quantizers, codecs, S2A loss + jitted reverse diffusion.

Reference had NO automated audio tests (SURVEY.md §4) — this fills that gap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.audio import mel


def test_w2vbert_features_match_reference_frontend():
    """Bit-comparable with HF SeamlessM4TFeatureExtractor (the reference's
    torch front-end, semantic_utils.py:35)."""
    tf = pytest.importorskip("transformers")
    fe = tf.SeamlessM4TFeatureExtractor(
        feature_size=80, num_mel_bins=80, stride=2, sampling_rate=16000
    )
    wav = np.random.default_rng(0).standard_normal(32000).astype(np.float32)
    ref = fe(wav, sampling_rate=16000, return_tensors="np")["input_features"][0]
    ours = np.asarray(mel.w2vbert_features(jnp.asarray(wav)[None], jnp.array([32000]))[0][0])
    assert ref.shape == ours.shape
    assert np.abs(ref - ours).mean() < 1e-4
    assert np.abs(ref - ours).max() < 5e-3


def test_w2vbert_features_padding_invariance():
    """Features of a padded batch must match the unpadded computation."""
    rng = np.random.default_rng(1)
    wav = rng.standard_normal(16000).astype(np.float32)
    solo, lens = mel.w2vbert_features(jnp.asarray(wav)[None], jnp.array([16000]))
    padded = np.zeros(24000, np.float32)
    padded[:16000] = wav
    batch, lens2 = mel.w2vbert_features(jnp.asarray(padded)[None], jnp.array([16000]))
    n = int(lens[0])
    assert int(lens2[0]) == n
    np.testing.assert_allclose(
        np.asarray(solo[0, :n]), np.asarray(batch[0, :n]), atol=1e-4
    )


def test_conformer_shapes():
    from maxtext_indextts2_tpu.audio.conformer import ConformerConfig, SemanticEncoder

    cfg = ConformerConfig(hidden_size=64, num_layers=3, num_heads=4,
                          intermediate_size=128, output_layer=2)
    model = SemanticEncoder(cfg)
    feats = jnp.ones((2, 20, 160))
    params = model.init(jax.random.PRNGKey(0), feats)
    out = model.apply(params, feats)
    assert out.shape == (2, 20, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_conformer_matches_hf_w2vbert():
    """Layer-output parity with HF Wav2Vec2BertModel under converted weights
    (reference loads facebook/w2v-bert-2.0 in torch, semantic_utils.py:11;
    params_from_hf ports the same checkpoint on-device)."""
    tf = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")
    from maxtext_indextts2_tpu.audio.conformer import (
        ConformerConfig, SemanticEncoder, params_from_hf,
    )

    hf_cfg = tf.Wav2Vec2BertConfig(
        hidden_size=32, num_hidden_layers=3, num_attention_heads=2,
        intermediate_size=48, feature_projection_input_dim=20,
        conv_depthwise_kernel_size=31, position_embeddings_type="relative_key",
        left_max_position_embeddings=64, right_max_position_embeddings=8,
        hidden_dropout=0.0, attention_dropout=0.0, feat_proj_dropout=0.0,
        conformer_conv_dropout=0.0,
    )
    torch.manual_seed(0)
    hf = tf.Wav2Vec2BertModel(hf_cfg).eval()

    feats = np.random.default_rng(1).standard_normal((2, 25, 20)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(feats), output_hidden_states=True).hidden_states

    cfg = ConformerConfig(input_dim=20, hidden_size=32, num_layers=3,
                          num_heads=2, intermediate_size=48, output_layer=3)
    params = params_from_hf(
        {k: v.numpy() for k, v in hf.state_dict().items()}, cfg
    )
    ours = np.asarray(SemanticEncoder(cfg).apply(params, jnp.asarray(feats)))
    # identity stats -> SemanticEncoder output == hidden_states[output_layer]
    np.testing.assert_allclose(ours, ref[3].numpy(), atol=2e-5, rtol=1e-4)


def test_fvq_roundtrip_and_gradients():
    from maxtext_indextts2_tpu.audio.quantize import FactorizedVectorQuantize

    q = FactorizedVectorQuantize(input_dim=32, codebook_size=64, codebook_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 10, 32))
    params = q.init(jax.random.PRNGKey(1), x)
    res = q.apply(params, x)
    assert res.indices.shape == (2, 10)
    assert res.quantized.shape == x.shape
    # vq2emb(indices) must equal the quantized value (modulo ST estimator)
    emb = q.apply(params, res.indices, method=q.vq2emb)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(res.quantized), atol=1e-5)
    # straight-through: gradient flows to the input
    g = jax.grad(lambda x: jnp.sum(q.apply(params, x).quantized ** 2))(x)
    assert float(jnp.abs(g).sum()) > 0


def test_rvq_residual_reduces_error():
    from maxtext_indextts2_tpu.audio.quantize import ResidualVQ

    rvq = ResidualVQ(input_dim=32, num_quantizers=4, codebook_size=128, codebook_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 50, 32))
    params = rvq.init(jax.random.PRNGKey(1), x)
    out, idx, commit, cb, per_layer = rvq.apply(params, x)
    assert idx.shape == (4, 1, 50)
    # vq2emb of indices reproduces the summed quantization
    emb = rvq.apply(params, idx, method=rvq.vq2emb)
    np.testing.assert_allclose(np.asarray(emb), np.asarray(out), atol=1e-5)
    # per-layer quantized contributions sum to the output
    np.testing.assert_allclose(
        np.asarray(jnp.sum(per_layer, axis=0)), np.asarray(out), atol=1e-5
    )
    # n_quantizers=1 equals the first stage alone
    out1, *_ = rvq.apply(params, x, 1)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(per_layer[0]), atol=1e-6)


def test_repcodec_quantize():
    from maxtext_indextts2_tpu.audio.repcodec import RepCodec

    codec = RepCodec(hidden_size=64, codebook_size=256, vocos_dim=32,
                     vocos_intermediate_dim=64, vocos_num_layers=2)
    feats = jax.random.normal(jax.random.PRNGKey(0), (2, 25, 64))
    params = codec.init(jax.random.PRNGKey(1), feats)
    ids = codec.apply(params, feats, method=codec.quantize)
    assert ids.shape == (2, 25)
    assert int(ids.min()) >= 0 and int(ids.max()) < 256
    recon, idx, commit, cb = codec.apply(params, feats)
    assert recon.shape == feats.shape


def test_acoustic_codec_roundtrip_shapes():
    from maxtext_indextts2_tpu.audio.acoustic import AcousticCodec

    codec = AcousticCodec(d_model=16, latent_dim=32, num_quantizers=4,
                          codebook_size=64, strides=(2, 2, 2, 2))  # stride 16 for speed
    wav = jax.random.normal(jax.random.PRNGKey(0), (1, 16 * 50))
    params = codec.init(jax.random.PRNGKey(1), wav)
    tokens = codec.apply(params, wav, method=codec.tokenize)
    assert tokens.shape == (4, 1, 50)
    # detokenize uses the full-size vocos head (hop 480): [B, T*480]
    out = codec.apply(params, tokens, method=codec.detokenize)
    assert out.shape == (1, 50 * 480)
    assert np.isfinite(np.asarray(out)).all()


def test_istft_reconstructs_signal():
    from maxtext_indextts2_tpu.audio.vocos import istft_overlap_add

    n_fft, hop = 64, 16
    t = np.arange(16 * 40) / 100.0
    sig = np.sin(2 * np.pi * 5 * t).astype(np.float32)[None]
    # forward stft (center-padded, hann)
    pad = (n_fft - hop) // 2
    x = np.pad(sig[0], (pad, pad))
    frames = np.lib.stride_tricks.sliding_window_view(x, n_fft)[::hop]
    win = np.hanning(n_fft + 1)[:-1]
    spec = np.fft.rfft(frames * win, axis=-1)
    out = istft_overlap_add(
        jnp.asarray(spec.real)[None], jnp.asarray(spec.imag)[None], n_fft, hop
    )
    n = min(out.shape[1], sig.shape[1])
    # interior must match (edges lose window normalization)
    np.testing.assert_allclose(
        np.asarray(out[0, hop * 2 : n - hop * 2]),
        sig[0, hop * 2 : n - hop * 2],
        atol=1e-3,
    )


class TestS2A:
    def _model(self):
        from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

        cfg = S2AConfig(
            num_quantizers=4, hidden_size=64, num_layers=2, num_heads=4,
            codebook_size=32, cond_codebook_size=128,
        )
        return S2AModel(cfg), cfg

    def test_loss(self):
        model, cfg = self._model()
        b, t = 2, 24
        x0 = jax.random.randint(jax.random.PRNGKey(0), (b, t, 4), 0, 32)
        x_mask = jnp.ones((b, t), jnp.int32)
        cond = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 128)
        params = model.init(jax.random.PRNGKey(2), x0, x_mask, cond, jax.random.PRNGKey(3))
        loss, aux = model.apply(params, x0, x_mask, cond, jax.random.PRNGKey(4))
        assert np.isfinite(float(loss))
        # roughly log(codebook) at init
        assert 1.0 < float(loss) < 6.0

    def test_reverse_diffusion_jits(self):
        model, cfg = self._model()
        b, p, t = 1, 4, 12
        x0 = jax.random.randint(jax.random.PRNGKey(0), (b, p + t, 4), 0, 32)
        x_mask = jnp.ones((b, p + t), jnp.int32)
        cond = jax.random.randint(jax.random.PRNGKey(1), (b, p + t), 0, 128)
        params = model.init(jax.random.PRNGKey(2), x0[:, : p + t], x_mask, cond, jax.random.PRNGKey(3))

        prompt = x0[:, :p, :]

        @jax.jit
        def sample(rng):
            return model.apply(
                params, cond, prompt, rng,
                method=model.reverse_diffusion,
                n_timesteps=(2, 2, 2, 2),
            )

        out = sample(jax.random.PRNGKey(5))
        assert out.shape == (b, t, 4)
        assert int(out.min()) >= 0 and int(out.max()) < 32
        # deterministic under same rng, different under different rng
        out2 = sample(jax.random.PRNGKey(5))
        np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_s2a_trainer_loss_decreases():
    """S2A training loop overfits a repeated synthetic batch."""
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.s2a_train import train_s2a

    cfg = load_config([
        "s2a_num_quantizers=2", "s2a_hidden_size=32", "s2a_num_layers=1",
        "s2a_num_heads=2", "s2a_codebook_size=16", "s2a_cond_codebook_size=32",
        "per_device_batch_size=0.25", "max_target_length=32", "steps=8",
        "learning_rate=3e-3", "warmup_steps_fraction=0", "dtype=float32",
    ])
    fixed = None

    def batch_fn(step):
        nonlocal fixed
        from maxtext_indextts2_tpu.train.s2a_train import synthetic_s2a_batch

        if fixed is None:
            fixed = synthetic_s2a_batch(cfg, 0)
        return fixed

    m = train_s2a(cfg, batch_fn)
    import numpy as np

    assert np.isfinite(m["loss"])


def test_codec_trainers_run():
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.train.codec_train import (
        train_acoustic_codec,
        train_repcodec,
    )

    cfg = load_config([
        "s2a_num_quantizers=2", "s2a_codebook_size=16", "s2a_hidden_size=32",
        "semantic_codebook_size=32", "per_device_batch_size=0.125",
        "steps=2", "dtype=float32",
    ])
    m1 = train_acoustic_codec(cfg)
    assert np.isfinite(m1["loss"])
    m2 = train_repcodec(cfg)
    assert np.isfinite(m2["loss"])


def test_reverse_diffusion_scan_matches_unrolled():
    """The grouped-scan sampler must produce exactly the unrolled result."""
    from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

    cfg = S2AConfig(num_quantizers=4, hidden_size=32, num_layers=1, num_heads=2,
                    codebook_size=16, cond_codebook_size=32)
    model = S2AModel(cfg)
    b, p, t = 1, 3, 10
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.randint(rng, (b, p + t, 4), 0, 16)
    cond = jax.random.randint(rng, (b, p + t), 0, 32)
    params = model.init(rng, x0, jnp.ones((b, p + t), jnp.int32), cond, rng)
    prompt = x0[:, :p, :]
    kw = dict(method=model.reverse_diffusion, n_timesteps=(3, 2, 2, 2))
    out_scan = model.apply(params, cond, prompt, jax.random.PRNGKey(7), **kw)
    out_unroll = model.apply(params, cond, prompt, jax.random.PRNGKey(7),
                             unroll=True, **kw)
    np.testing.assert_array_equal(np.asarray(out_scan), np.asarray(out_unroll))


def test_reverse_diffusion_cfg_until():
    """Static CFG truncation: cfg_until=1.0 is bit-identical to the default
    path; cfg_until<1.0 matches the unrolled sampler (same rng stream, the
    late steps just skip the uncond call) and changes the output vs full CFG
    (proving the truncation is live)."""
    from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

    cfg = S2AConfig(num_quantizers=3, hidden_size=32, num_layers=1, num_heads=2,
                    codebook_size=16, cond_codebook_size=32)
    model = S2AModel(cfg)
    b, p, t = 2, 3, 12
    rng = jax.random.PRNGKey(1)
    x0 = jax.random.randint(rng, (b, p + t, 3), 0, 16)
    cond = jax.random.randint(rng, (b, p + t), 0, 32)
    params = model.init(rng, x0, jnp.ones((b, p + t), jnp.int32), cond, rng)
    prompt = x0[:, :p, :]
    kw = dict(method=model.reverse_diffusion, n_timesteps=(4, 3, 3))
    srng = jax.random.PRNGKey(11)
    full = model.apply(params, cond, prompt, srng, **kw)
    full_until = model.apply(params, cond, prompt, srng, cfg_until=1.0, **kw)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(full_until))
    half = model.apply(params, cond, prompt, srng, cfg_until=0.5, **kw)
    half_unroll = model.apply(params, cond, prompt, srng, cfg_until=0.5,
                              unroll=True, **kw)
    np.testing.assert_array_equal(np.asarray(half), np.asarray(half_unroll))
    assert not np.array_equal(np.asarray(half), np.asarray(full))


def test_reverse_diffusion_variable_length_batching():
    """Variable-length batched sampling (x_mask/prompt_mask — beyond the
    reference's python sampler): (a) masks of all-ones reproduce the
    fixed-length path exactly, (b) a row's valid output is independent of
    the padded tail's contents AND of the other rows in the batch."""
    from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

    cfg = S2AConfig(num_quantizers=4, hidden_size=32, num_layers=1, num_heads=2,
                    codebook_size=16, cond_codebook_size=32)
    model = S2AModel(cfg)
    b, p, t = 2, 4, 12
    rng = jax.random.PRNGKey(0)
    x0 = jax.random.randint(rng, (b, p + t, 4), 0, 16)
    cond = jax.random.randint(rng, (b, p + t), 0, 32)
    params = model.init(rng, x0, jnp.ones((b, p + t), jnp.int32), cond, rng)
    prompt = x0[:, :p, :]
    kw = dict(method=model.reverse_diffusion, n_timesteps=(3, 2, 2, 2))
    srng = jax.random.PRNGKey(7)

    # (a) all-ones masks == fixed path (same shapes -> same rng draws)
    fixed = model.apply(params, cond, prompt, srng, **kw)
    ones = model.apply(params, cond, prompt, srng,
                       x_mask=jnp.ones((b, t), jnp.int32),
                       prompt_mask=jnp.ones((b, p), jnp.int32), **kw)
    np.testing.assert_array_equal(np.asarray(fixed), np.asarray(ones))

    # (b) row 0 valid for 8/12 target + 3/4 prompt positions; row 1 full
    x_mask = jnp.asarray([[1] * 8 + [0] * 4, [1] * 12], jnp.int32)
    p_mask = jnp.asarray([[1, 1, 1, 0], [1, 1, 1, 1]], jnp.int32)
    out1 = model.apply(params, cond, prompt, srng,
                       x_mask=x_mask, prompt_mask=p_mask, **kw)
    # scribble over row 0's padded cond/prompt tail; valid output unchanged
    cond2 = cond.at[0, p + 8:].set(5).at[0, p - 1].set(3)
    prompt2 = prompt.at[0, p - 1].set(7)
    out2 = model.apply(params, cond2, prompt2, srng,
                       x_mask=x_mask, prompt_mask=p_mask, **kw)
    np.testing.assert_array_equal(
        np.asarray(out1[0, :8]), np.asarray(out2[0, :8]))
    # and row 1 (untouched, full-length) is unaffected by row 0's edits
    np.testing.assert_array_equal(np.asarray(out1[1]), np.asarray(out2[1]))
    assert int(out1.min()) >= 0 and int(out1.max()) < 16


def test_semantic_tokenizer_batch_matches_single():
    """Single-wav vs padded-batch tokenization must agree on the valid
    region (reference: root test_batch_tokenizer.py)."""
    import numpy as np

    from maxtext_indextts2_tpu.audio.conformer import ConformerConfig
    from maxtext_indextts2_tpu.audio.semantic_tokenizer import SemanticTokenizer

    tok = SemanticTokenizer(
        encoder_cfg=ConformerConfig(
            hidden_size=64, num_layers=2, num_heads=4,
            intermediate_size=128, output_layer=2,
        ),
        repcodec_kwargs=dict(codebook_size=256, vocos_dim=32,
                             vocos_intermediate_dim=64, vocos_num_layers=1),
    )
    tok.init_params()
    rng = np.random.default_rng(0)
    w1 = rng.standard_normal(16000).astype(np.float32) * 0.1
    w2 = rng.standard_normal(8000).astype(np.float32) * 0.1

    c1, l1 = tok.tokenize(w1[None])
    c2, l2 = tok.tokenize(w2[None])

    batch = np.zeros((2, 16000), np.float32)
    batch[0] = w1
    batch[1, :8000] = w2
    cb, lb = tok.tokenize(batch, wav_lengths=np.array([16000, 8000]))
    n1, n2 = int(np.asarray(l1)[0]), int(np.asarray(l2)[0])
    assert int(np.asarray(lb)[0]) == n1 and int(np.asarray(lb)[1]) == n2
    # row 0 fills the bucket exactly -> bit-identical program, exact match
    np.testing.assert_array_equal(np.asarray(cb)[0, :n1], np.asarray(c1)[0, :n1])
    # row 1 is padded: masking keeps hiddens within fp noise (verified
    # ~3e-5), but the random-init 8-d codebook has no decision margins, so
    # nearest-neighbor ids may flip on ties — require strong agreement
    # rather than exactness (trained codebooks are stable).
    agree = np.mean(np.asarray(cb)[1, :n2] == np.asarray(c2)[0, :n2])
    assert agree >= 0.7, agree


def test_row_quantize_kernel_matches_jnp():
    """Fused absmax+round Pallas kernel == the Int8Dense jnp quant path
    (scales to 1 ulp; int8 codes may differ by 1 on exact .5 ties)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.ops.quant_kernels import row_quantize_int8

    for dtype, s in [(jnp.float32, 300), (jnp.bfloat16, 256), (jnp.float32, 257)]:
        x = (jax.random.normal(jax.random.PRNGKey(0), (2, s, 256), jnp.float32)
             * 3.0).astype(dtype)
        xq, xs = row_quantize_int8(x, interpret=True)
        xf = x.astype(jnp.float32)
        xs_ref = jnp.max(jnp.abs(xf), axis=-1) / 127.0
        xq_ref = jnp.round(xf / jnp.maximum(xs_ref[..., None], 1e-9)).astype(jnp.int8)
        np.testing.assert_allclose(np.asarray(xs), np.asarray(xs_ref), rtol=1e-6)
        diff = np.abs(np.asarray(xq, np.int32) - np.asarray(xq_ref, np.int32))
        assert diff.max() <= 1
        assert (diff > 0).mean() < 1e-3
    # zero rows stay zero (the 1e-9 scale floor)
    z = jnp.zeros((1, 8, 128), jnp.float32)
    zq, zs = row_quantize_int8(z, interpret=True)
    assert np.all(np.asarray(zq) == 0) and np.all(np.asarray(zs) == 0)


def test_producer_fused_quant_kernels_match_two_step():
    """ada_rmsnorm_quantize == ada_rmsnorm -> row_quantize (exact), and
    silu_mul_quantize == silu(g)*u -> row_quantize (exact)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.ops.ada_rmsnorm import ada_rmsnorm
    from maxtext_indextts2_tpu.ops.quant_kernels import (
        ada_rmsnorm_quantize, row_quantize_int8, silu_mul_quantize,
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 300, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (2, 256), jnp.float32)
    q1, s1 = ada_rmsnorm_quantize(x, w, interpret=True)
    q2, s2 = row_quantize_int8(ada_rmsnorm(x, w, True), interpret=True)
    np.testing.assert_array_equal(np.asarray(q1), np.asarray(q2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))

    g = jax.random.normal(jax.random.PRNGKey(2), (2, 300, 256), jnp.float32)
    u = jax.random.normal(jax.random.PRNGKey(3), (2, 300, 256), jnp.float32)
    q3, s3 = silu_mul_quantize(g, u, interpret=True)
    q4, s4 = row_quantize_int8(jax.nn.silu(g) * u, interpret=True)
    np.testing.assert_array_equal(np.asarray(q3), np.asarray(q4))
    np.testing.assert_array_equal(np.asarray(s3), np.asarray(s4))


def test_ada_rmsnorm_kernel_matches_unfused():
    """Fused Pallas AdaRMSNorm == the unfused jnp math, fwd and bwd."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.ops.ada_rmsnorm import ada_rmsnorm

    def ref(x, w):
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + 1e-6).astype(x.dtype)
        return normed * w[:, None, :].astype(x.dtype)

    k0, k1 = jax.random.split(jax.random.PRNGKey(0))
    for dtype, s, atol in [(jnp.float32, 650, 0), (jnp.bfloat16, 257, 0.02)]:
        x = jax.random.normal(k0, (3, s, 256), dtype)
        w = 1.0 + 0.1 * jax.random.normal(k1, (3, 256), dtype)
        got = ada_rmsnorm(x, w, True)
        want = ref(x, w)
        if atol == 0:
            assert (np.asarray(got) == np.asarray(want)).all()
        else:
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
            )

    # gradient parity (f32; custom-VJP backward vs autodiff of the ref)
    x = jax.random.normal(k0, (2, 64, 256), jnp.float32)
    w = 1.0 + 0.1 * jax.random.normal(k1, (2, 256), jnp.float32)
    loss_fused = lambda x, w: jnp.sum(jnp.sin(ada_rmsnorm(x, w, True)))
    loss_ref = lambda x, w: jnp.sum(jnp.sin(ref(x, w)))
    gx_f, gw_f = jax.grad(loss_fused, argnums=(0, 1))(x, w)
    gx_r, gw_r = jax.grad(loss_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(gx_f), np.asarray(gx_r), atol=2e-5)
    np.testing.assert_allclose(np.asarray(gw_f), np.asarray(gw_r), atol=2e-5)


def test_s2a_bf16_loss_parity_with_f32():
    """The bf16 serving config (bf16 attention logits + bf16 MLP gate/up
    outputs) must stay numerically close to the f32 path at init."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

    kw = dict(num_quantizers=4, hidden_size=64, num_layers=2, num_heads=4,
              codebook_size=32, cond_codebook_size=128)
    m32 = S2AModel(S2AConfig(dtype=jnp.float32, **kw))
    m16 = S2AModel(S2AConfig(dtype=jnp.bfloat16, **kw))
    b, t = 2, 24
    x0 = jax.random.randint(jax.random.PRNGKey(0), (b, t, 4), 0, 32)
    x_mask = jnp.ones((b, t), jnp.int32)
    cond = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 128)
    params = m32.init(jax.random.PRNGKey(2), x0, x_mask, cond, jax.random.PRNGKey(3))
    l32, _ = m32.apply(params, x0, x_mask, cond, jax.random.PRNGKey(4))
    l16, _ = m16.apply(params, x0, x_mask, cond, jax.random.PRNGKey(4))
    assert np.isfinite(float(l16))
    np.testing.assert_allclose(float(l16), float(l32), rtol=2e-2)


def test_s2a_int8_matmul_loss_parity_and_sampler():
    """int8_matmul serving mode: same param tree as f32, loss close at init,
    and the jitted reverse_diffusion sampler still runs."""
    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

    cfg = S2AConfig(num_quantizers=4, hidden_size=64, num_layers=2,
                    num_heads=4, codebook_size=32, cond_codebook_size=128,
                    dtype=jnp.float32)
    m32 = S2AModel(cfg)
    m8 = S2AModel(dataclasses.replace(cfg, int8_matmul=True))
    b, t = 2, 24
    x0 = jax.random.randint(jax.random.PRNGKey(0), (b, t, 4), 0, 32)
    x_mask = jnp.ones((b, t), jnp.int32)
    cond = jax.random.randint(jax.random.PRNGKey(1), (b, t), 0, 128)
    params = m32.init(jax.random.PRNGKey(2), x0, x_mask, cond, jax.random.PRNGKey(3))
    # identical tree: the int8 model consumes the f32 checkpoint unmodified
    l32, _ = m32.apply(params, x0, x_mask, cond, jax.random.PRNGKey(4))
    l8, _ = m8.apply(params, x0, x_mask, cond, jax.random.PRNGKey(4))
    assert np.isfinite(float(l8))
    np.testing.assert_allclose(float(l8), float(l32), rtol=2e-2)
    codes = jax.jit(
        lambda p, c, pr, r: m8.apply(
            p, c, pr, r, method=m8.reverse_diffusion, n_timesteps=(2, 2, 2, 2)
        )
    )(params, cond, x0[:, :8, :], jax.random.PRNGKey(5))
    assert codes.shape == (b, t - 8, 4)
    assert np.all(np.asarray(codes) >= 0) and np.all(np.asarray(codes) < 32)

    # offline mode: pre-quantized tree must match the dynamic path exactly
    from maxtext_indextts2_tpu.audio.s2a import quantize_s2a_params

    moff = S2AModel(dataclasses.replace(cfg, int8_matmul="offline"))
    pq = quantize_s2a_params(params, moff, (x0, x_mask, cond, jax.random.PRNGKey(3)))
    loff, _ = moff.apply(pq, x0, x_mask, cond, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(loff), float(l8), rtol=1e-6)
    kq = pq["params"]["denoiser"]["layers_0"]["qkv"]["kernel"]
    assert kq.dtype == jnp.int8

    # bf16 weight pre-cast: loss stays close, embeddings stay f32
    from maxtext_indextts2_tpu.audio.s2a import cast_denoiser_params

    pc = cast_denoiser_params(params)
    assert pc["params"]["denoiser"]["layers_0"]["qkv"]["kernel"].dtype == jnp.bfloat16
    assert pc["params"]["token_emb"].dtype == jnp.float32
    m16 = S2AModel(dataclasses.replace(cfg, dtype=jnp.bfloat16))
    lc, _ = m16.apply(pc, x0, x_mask, cond, jax.random.PRNGKey(4))
    np.testing.assert_allclose(float(lc), float(l32), rtol=3e-2)


def test_kth_largest_matches_top_k():
    """Hierarchical values-only kth-largest == lax.top_k's kth value."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.audio.s2a import _kth_largest

    for shape, k in [((8, 50, 1024), 20), ((2, 7, 1024), 20), ((3, 1024), 1),
                     ((2, 5, 256), 20), ((2, 5, 100), 7), ((2, 5, 1024), 200)]:
        x = jax.random.normal(jax.random.PRNGKey(0), shape, jnp.float32)
        want = jax.lax.top_k(x, k)[0][..., -1:]
        np.testing.assert_array_equal(np.asarray(_kth_largest(x, k)), np.asarray(want))
    # heavy ties + -1e9 fills (the sampler's masked-logit regime)
    x = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(1), 0.9, (4, 6, 1024)), -1e9,
        jax.random.randint(jax.random.PRNGKey(2), (4, 6, 1024), 0, 5).astype(jnp.float32),
    )
    np.testing.assert_array_equal(
        np.asarray(_kth_largest(x, 20)),
        np.asarray(jax.lax.top_k(x, 20)[0][..., -1:]),
    )
    # zero-length target (empty LM generation): must not raise, like top_k
    empty = jnp.zeros((1, 0, 1024), jnp.float32)
    assert _kth_largest(empty, 20).shape == (1, 0, 1)


def test_s2a_attention_kernel_matches_einsum():
    """One-shot sampler attention kernel == softmax(qk^T)v einsum, including
    the static masking of the pad-to-128 tail."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from maxtext_indextts2_tpu.ops.s2a_attention import s2a_attention

    def ref(q, k, v):
        # f32 logits: the kernel's S x S matrix lives in VMEM so it keeps f32
        # there (unlike the XLA path, where bf16 logits pay for HBM traffic)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(logits, axis=-1)
        return jnp.einsum(
            "bhqk,bkhd->bqhd", probs.astype(q.dtype), v,
            preferred_element_type=jnp.float32,
        ).astype(q.dtype)

    keys = jax.random.split(jax.random.PRNGKey(1), 3)
    for dtype, s, atol in [(jnp.float32, 128, 3e-5), (jnp.float32, 70, 3e-5),
                           (jnp.bfloat16, 130, 0.03)]:
        q, k, v = (jax.random.normal(kk, (2, s, 4, 64), dtype) for kk in keys)
        got = s2a_attention(q, k, v, interpret=True)
        np.testing.assert_allclose(
            np.asarray(got, np.float32), np.asarray(ref(q, k, v), np.float32),
            atol=atol)


def test_reverse_diffusion_batch_sharded_matches_single_device():
    """S2A serving scale-out: reverse_diffusion jitted with the batch
    sharded over an 8-device mesh produces EXACTLY the single-device codes
    (jax RNG is shape-deterministic, so DP sharding must be a pure layout
    change). This is the multi-chip serving deployment shape for v5e-8."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from maxtext_indextts2_tpu.audio.s2a import S2AConfig, S2AModel

    cfg = S2AConfig(num_quantizers=3, hidden_size=32, num_layers=2,
                    num_heads=2, codebook_size=16, cond_codebook_size=32)
    model = S2AModel(cfg)
    b, p, t = 8, 3, 9
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.integers(0, 32, (b, p + t)), jnp.int32)
    prompt = jnp.asarray(rng.integers(0, 16, (b, p, 3)), jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, 4, 3), jnp.int32), jnp.ones((1, 4), jnp.int32),
        jnp.zeros((1, 4), jnp.int32), jax.random.PRNGKey(1),
    )
    kw = dict(n_timesteps=(2, 2, 2), method=S2AModel.reverse_diffusion)

    ref = model.apply(params, cond, prompt, jax.random.PRNGKey(3), **kw)

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())
    params_r = jax.device_put(params, repl)
    cond_s = jax.device_put(cond, batch_sh)
    prompt_s = jax.device_put(prompt, batch_sh)

    fn = jax.jit(
        lambda pr, c, pc, r: model.apply(pr, c, pc, r, **kw),
        in_shardings=(repl, batch_sh, batch_sh, repl),
        out_shardings=batch_sh,
    )
    out = fn(params_r, cond_s, prompt_s, jax.random.PRNGKey(3))
    assert out.sharding.is_equivalent_to(batch_sh, out.ndim)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_residual_vq_quantizer_dropout():
    """quantizer_dropout (reference quantize.py:193-218): dropped samples'
    outputs only include their first n stages; losses masked accordingly;
    no-rng calls are unaffected."""
    from maxtext_indextts2_tpu.audio.quantize import ResidualVQ

    rvq = ResidualVQ(input_dim=6, num_quantizers=3, codebook_size=8,
                     codebook_dim=3, quantizer_dropout=0.5)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((4, 5, 6)), jnp.float32
    )
    params = rvq.init(jax.random.PRNGKey(0), x)

    out_plain, idx, commit, cb, per_q = rvq.apply(params, x)
    rng = jax.random.PRNGKey(7)
    out_drop, idx_d, commit_d, cb_d, per_q_d = rvq.apply(
        params, x, dropout_rng=rng
    )
    # indices/per-stage quantized are identical (residual chain unmasked)
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(idx_d))
    np.testing.assert_allclose(np.asarray(per_q), np.asarray(per_q_d), atol=0)

    # reconstruct the mask the module used and check the output sum
    draw = jax.random.randint(rng, (4,), 1, 4)
    n_drop = 2  # ceil-free int(4 * 0.5)
    n_per_sample = np.where(np.arange(4) < n_drop, np.asarray(draw), 4)
    expect = np.zeros_like(np.asarray(out_plain))
    for i in range(3):
        m = (i < n_per_sample).astype(np.float32)
        expect += np.asarray(per_q)[i] * m[:, None, None]
    np.testing.assert_allclose(np.asarray(out_drop), expect, atol=1e-6)

    # undropped samples (i >= n_drop) keep the full stack
    np.testing.assert_allclose(
        np.asarray(out_drop)[n_drop:], np.asarray(out_plain)[n_drop:], atol=1e-6
    )


def test_mcd_metric_properties():
    """MCD harness (benchmarks/mcd.py — BASELINE's TTS quality metric):
    zero for identical signals, monotone in perturbation, shift-tolerant."""
    from benchmarks.mcd import mcd

    rng = np.random.default_rng(0)
    # broadband speech-like base: white noise through a moving envelope
    # (pure tones are floor-dominated in mel space and defeat the metric)
    white = rng.standard_normal(24000).astype(np.float32)
    brown = np.cumsum(white)
    brown = (brown / np.abs(brown).max()).astype(np.float32)
    wav = 0.5 * white * 0.05 + 0.5 * brown

    assert mcd(wav, wav) == pytest.approx(0.0, abs=1e-5)

    def tilt(eps):  # growing spectral-envelope change
        return ((1 - eps) * wav + eps * 0.3 * white).astype(np.float32)

    d_small, d_big = mcd(wav, tilt(0.1)), mcd(wav, tilt(0.5))
    assert 0 < d_small < d_big

    # a one-frame (10ms) shift is absorbed by the offset search
    shifted = np.roll(wav, 240)
    assert mcd(wav, shifted, max_shift=2) < mcd(wav, shifted, max_shift=0)
