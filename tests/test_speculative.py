"""Speculative decoding: exactness vs plain greedy decode.

The defining property of speculative decoding is that the OUTPUT DISTRIBUTION
is unchanged — with greedy sampling, the emitted stream must be bit-identical
to the target model's plain decode, no matter what the draft model proposes.
We test three draft regimes: a random (useless) draft, the target itself as
draft (perfect: every round must commit K+1 tokens), and sliding-window +
quantized-KV variants of the cache discipline.
"""

import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.infer.speculative import SpeculativeEngine

TARGET = [
    "decoder_block=tts", "base_emb_dim=64", "base_num_query_heads=4",
    "base_num_kv_heads=2", "base_mlp_dim=128", "base_num_decoder_layers=3",
    "head_dim=16", "vocab_size=256", "max_target_length=96",
    "max_prefill_predict_length=32", "per_device_batch_size=0.25",
    "decode_sampling_strategy=greedy", "scan_layers=true",
]
DRAFT = [
    "decoder_block=tts", "base_emb_dim=32", "base_num_query_heads=2",
    "base_num_kv_heads=1", "base_mlp_dim=64", "base_num_decoder_layers=1",
    "head_dim=16", "vocab_size=256", "max_target_length=96",
    "max_prefill_predict_length=32", "per_device_batch_size=0.25",
    "decode_sampling_strategy=greedy", "scan_layers=false",
]


def _greedy_reference(cfg_args, prompt, n_tokens):
    cfg = load_config(cfg_args)
    eng = Engine(cfg)
    eng.load_params()
    return eng.generate_stream(prompt, n_tokens)


@pytest.mark.parametrize("extra", [[], ["quantize_kvcache=true"]],
                         ids=["bf16_kv", "int8_kv"])
def test_speculative_exactness_random_draft(extra):
    """Random draft: almost nothing accepted, output still exact."""
    prompt = np.arange(3, 15, dtype=np.int32)
    want = _greedy_reference(TARGET + extra, prompt, 24)

    spec = SpeculativeEngine(load_config(TARGET + extra), load_config(DRAFT),
                             num_draft_tokens=3)
    spec.load_params()
    got, rounds = spec.generate_stream(prompt, 24)
    assert got == want
    assert rounds <= 24  # never more dispatches than plain decode


def test_speculative_perfect_draft_accepts_everything():
    """Draft == target: every draft matches, each round commits K+1 tokens."""
    prompt = np.arange(5, 12, dtype=np.int32)
    want = _greedy_reference(TARGET, prompt, 25)

    spec = SpeculativeEngine(load_config(TARGET), load_config(TARGET),
                             num_draft_tokens=3)
    spec.load_params()
    # same init seed -> identical params for draft and target
    got, rounds = spec.generate_stream(prompt, 25)
    assert got == want
    # 24 post-prefill tokens at up to K+1=4 per round: perfect acceptance
    # would be 6 rounds; bf16 numerics differ slightly between the 1-token
    # AR path and the K-token verify path, so allow a few rejections while
    # still requiring a >=2x dispatch reduction vs plain decode.
    assert rounds <= 12, rounds


def test_speculative_sliding_window_exactness():
    extra = ["sliding_window_size=24"]
    prompt = np.arange(7, 19, dtype=np.int32)
    want = _greedy_reference(TARGET + extra, prompt, 20)

    spec = SpeculativeEngine(load_config(TARGET + extra),
                             load_config(DRAFT + extra), num_draft_tokens=4)
    spec.load_params()
    got, _ = spec.generate_stream(prompt, 20)
    assert got == want


def test_speculative_mla_exactness():
    """MLA latent cache supports the verify span (models/mla.py MODE_VERIFY):
    speculative output is exactly the target's plain greedy decode."""
    mla_target = [
        "decoder_block=deepseek", "base_emb_dim=64", "base_mlp_dim=128",
        "base_num_decoder_layers=2", "base_num_query_heads=4",
        "base_num_kv_heads=4", "q_lora_rank=32", "kv_lora_rank=32",
        "qk_nope_head_dim=32", "qk_rope_head_dim=16", "v_head_dim=32",
        "num_experts=1", "vocab_size=256", "max_target_length=96",
        "max_prefill_predict_length=32", "per_device_batch_size=0.25",
        "decode_sampling_strategy=greedy", "scan_layers=false",
        "dtype=float32",
    ]
    prompt = np.arange(3, 15, dtype=np.int32)
    want = _greedy_reference(mla_target, prompt, 20)

    spec = SpeculativeEngine(load_config(mla_target), load_config(DRAFT),
                             num_draft_tokens=3)
    spec.load_params()
    got, rounds = spec.generate_stream(prompt, 20)
    assert got == want
    assert rounds <= 20


def test_speculative_multislot_isolation():
    """Two slots with different prompts decode independently and exactly."""
    cfg_t = load_config(TARGET + ["per_device_batch_size=0.5"])
    cfg_d = load_config(DRAFT + ["per_device_batch_size=0.5"])
    p1 = np.arange(3, 11, dtype=np.int32)
    p2 = np.arange(40, 61, dtype=np.int32)
    w1 = _greedy_reference(TARGET, p1, 16)
    w2 = _greedy_reference(TARGET, p2, 16)

    spec = SpeculativeEngine(cfg_t, cfg_d, num_draft_tokens=3)
    spec.load_params()
    state = spec.init_decode_state()
    pre1, f1 = spec.prefill(p1, len(p1))
    pre2, f2 = spec.prefill(p2, len(p2))
    state = spec.insert(pre1, state, 0)
    state = spec.insert(pre2, state, 1)
    got = {0: [int(np.asarray(f1)[0])], 1: [int(np.asarray(f2)[0])]}
    while min(len(v) for v in got.values()) < 16:
        state, toks, n_new = spec.generate(state)
        toks, n_new = np.asarray(toks), np.asarray(n_new)
        for s in (0, 1):
            got[s].extend(int(t) for t in toks[s, : n_new[s]])
    assert got[0][:16] == w1
    assert got[1][:16] == w2
