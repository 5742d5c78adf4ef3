"""Full zero-shot TTS pipeline test (reference: maskgct/full_inference.py —
which could not run end-to-end; ours must)."""

import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.audio.pipeline import build_tiny_pipeline

CFG = [
    "vocab_size=9344", "audio_codebook_size=8192",
    "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
    "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
    "max_target_length=512", "max_prefill_predict_length=128",
    "per_device_batch_size=0.125", "dtype=float32", "decoder_block=tts",
    "s2a_num_quantizers=4", "s2a_hidden_size=64", "s2a_num_layers=2",
    "s2a_num_heads=4", "s2a_codebook_size=64", "s2a_timesteps=[2,2,2,2]",
    "semantic_codebook_size=8192",
]


@pytest.fixture(scope="module")
def pipeline():
    return build_tiny_pipeline(load_config(CFG))


def test_synthesize_end_to_end(pipeline):
    rng = np.random.default_rng(0)
    wav16 = rng.standard_normal(16000).astype(np.float32) * 0.1
    wav24 = rng.standard_normal(24000).astype(np.float32) * 0.1
    wav, info = pipeline.synthesize("hello tpu", wav16, wav24, max_new_tokens=12)
    assert wav.ndim == 1 and len(wav) > 0
    assert len(wav) % 480 == 0  # hop-aligned 24 kHz samples
    assert np.isfinite(wav).all()
    assert info["semantic_tokens"] >= 1
    assert info["audio_seconds"] == pytest.approx(len(wav) / 24000.0)


def test_synthesize_batch_heterogeneous(pipeline):
    """Batched synthesis of different-length requests: one masked S2A pass,
    per-row truncated wavs (beyond the reference, whose sampler is
    single-utterance offline torch)."""
    rng = np.random.default_rng(1)

    def req(sec16, sec24, text, mnt):
        return {
            "text": text,
            "prompt_wav_16k": rng.standard_normal(int(16000 * sec16)).astype(np.float32) * 0.1,
            "prompt_wav_24k": rng.standard_normal(int(24000 * sec24)).astype(np.float32) * 0.1,
            "max_new_tokens": mnt,
        }

    reqs = [req(1.0, 1.0, "short", 6), req(0.8, 0.8, "a longer sentence", 14),
            req(1.2, 1.2, "mid", 10)]
    out = pipeline.synthesize_batch(reqs, length_bucket=16)
    assert len(out) == 3
    for wav, info in out:
        assert info["batch"] == 3
        assert len(wav) == info["semantic_tokens"] * 480  # per-row truncation
        if len(wav):
            assert np.isfinite(wav).all()
    # rows may stop generation at different points; the batch padded to one
    # bucket regardless
    assert len({info["semantic_tokens"] for _, info in out}) >= 1

    # generate_fn hook (the server's orchestrator-backed LM stage): canned
    # embedding ids flow through map_semantic and size the wavs exactly
    audio_emb = [pipeline.mapping.audio_to_embedding(a) for a in (1, 2, 3, 4, 5)]

    def canned(lm_prompts, mnts):
        assert len(lm_prompts) == 2 and mnts == [6, 14]
        return [audio_emb[:3], audio_emb[:5]]

    out2 = pipeline.synthesize_batch(reqs[:2], length_bucket=16, generate_fn=canned)
    assert [i["semantic_tokens"] for _, i in out2] == [3, 5]
    assert [len(w) for w, _ in out2] == [3 * 480, 5 * 480]


def test_frontend_batch_matches_per_request(pipeline):
    """Batched (bucketed) frontend must reproduce the per-request result
    bit-for-bit on bucket-exact rows, and handle mixed lengths."""
    import jax.numpy as jnp

    rng = np.random.default_rng(2)

    def req(sec):
        return {
            "prompt_wav_16k": rng.standard_normal(int(16000 * sec)).astype(np.float32) * 0.1,
            "prompt_wav_24k": rng.standard_normal(int(24000 * sec)).astype(np.float32) * 0.1,
        }

    # bucket-exact (multiples of 0.5 s): bitwise parity with per-request
    reqs = [req(1.0), req(0.5), req(1.0)]
    sems, acs = pipeline.frontend_batch(reqs)
    for r, sem, ac in zip(reqs, sems, acs):
        w16 = r["prompt_wav_16k"]
        ref_sem, ref_len = pipeline.semantic_tokenizer.tokenize(w16[None])
        ref_sem = np.asarray(ref_sem)[0, : int(np.asarray(ref_len)[0])]
        np.testing.assert_array_equal(sem, ref_sem)
        ref_ac = pipeline._jit_tok(
            pipeline.codec_params, jnp.asarray(r["prompt_wav_24k"])[None]
        )
        ref_ac = np.asarray(jnp.transpose(ref_ac, (1, 2, 0))[0])
        np.testing.assert_array_equal(ac, ref_ac[: ac.shape[0]])

    # mixed non-bucket lengths: shapes scale with true length
    reqs = [req(0.8), req(1.2)]
    sems, acs = pipeline.frontend_batch(reqs)
    assert sems[0].shape[0] < sems[1].shape[0]
    assert acs[0].shape[0] == int(24000 * 0.8) // 480
    assert acs[1].shape[0] == int(24000 * 1.2) // 480
    for s, a in zip(sems, acs):
        assert np.isfinite(a).all() if a.dtype.kind == "f" else True
        assert s.ndim == 1 and a.ndim == 2


def test_lm_prompt_construction(pipeline):
    m = pipeline.mapping
    prompt = pipeline.text_and_prompt_to_lm_prompt("ab", np.array([0, 5]))
    # [BT] text(with bos/eos) [BA] audio...
    assert prompt[0] == m.audio_to_embedding(m.marker_bt_audio_id)
    ba_pos = list(prompt).index(m.audio_to_embedding(m.marker_ba_audio_id))
    assert ba_pos > 1
    assert prompt[ba_pos + 1] == m.audio_to_embedding(0)
    assert prompt[ba_pos + 2] == m.audio_to_embedding(5)
    assert (prompt < pipeline.cfg.vocab_size).all()


def test_generate_semantic_stops_on_non_audio(pipeline):
    # embedding ids that map back to audio, then a text id terminates
    m = pipeline.mapping
    lm_prompt = pipeline.text_and_prompt_to_lm_prompt("x", np.array([1, 2, 3]))
    out = pipeline.generate_semantic(lm_prompt, max_new_tokens=8)
    assert isinstance(out, list)
    assert all(0 <= a < m.codebook_size for a in out)


def test_synthesize_with_int8_offline_s2a():
    """s2a_serving_dtype=int8_offline builds a pre-quantized S2A stage and
    still synthesizes end-to-end."""
    pl = build_tiny_pipeline(load_config(CFG + ["s2a_serving_dtype=int8_offline"]))
    import jax.numpy as jnp

    kq = pl.s2a_params["params"]["denoiser"]["layers_0"]["qkv"]["kernel"]
    assert kq.dtype == jnp.int8
    # the int8 serving combo also pre-casts the denoiser's float params to
    # bf16 (cast_denoiser_params) so the residual stream is half-width
    scales = pl.s2a_params["params"]["denoiser"]["layers_0"]["qkv"]["kernel_scale"]
    assert scales.dtype == jnp.float32  # quant scales stay f32
    norm_w = pl.s2a_params["params"]["denoiser"]["layers_0"]["input_norm"][
        "to_weight"]["kernel"]
    assert norm_w.dtype == jnp.bfloat16
    rng = np.random.default_rng(1)
    wav16 = rng.standard_normal(16000).astype(np.float32) * 0.1
    wav24 = rng.standard_normal(24000).astype(np.float32) * 0.1
    wav, info = pl.synthesize("int8 path", wav16, wav24, max_new_tokens=8)
    assert wav.ndim == 1 and len(wav) > 0 and np.isfinite(wav).all()
