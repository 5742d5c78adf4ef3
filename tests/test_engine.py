"""Inference engine tests: prefill/insert/generate parity with the
train-mode forward, multi-slot isolation, sampling strategies.

Mirrors reference maxengine tests + decode.py's autoregressive_decode_assert.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.infer.sampling import sample_tokens
from maxtext_indextts2_tpu.models import Transformer

CFG = [
    "base_emb_dim=128",
    "base_mlp_dim=256",
    "base_num_decoder_layers=2",
    "base_num_query_heads=4",
    "base_num_kv_heads=2",
    "head_dim=32",
    "vocab_size=512",
    "max_target_length=64",
    "max_prefill_predict_length=16",
    "per_device_batch_size=0.25",  # 2 slots on 8 devices
    "decode_sampling_strategy=greedy",
    "dtype=float32",
]


@pytest.fixture(scope="module")
def engine():
    cfg = load_config(CFG)
    eng = Engine(cfg)
    eng.load_params()
    return eng


def test_greedy_decode_matches_teacher_forcing(engine):
    """Greedy engine decode must equal argmax over the train-mode forward on
    the generated sequence (the reference's decode assert strategy)."""
    cfg = engine.cfg
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = engine.generate_stream(prompt, 8)

    # teacher-forced check: feed prompt+generated through train-mode forward
    full = np.concatenate([prompt, np.array(out[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    positions = jnp.arange(tokens.shape[1])[None, :]
    segs = jnp.ones_like(tokens)
    logits = engine.model.apply({"params": engine.params}, tokens, positions, segs)
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    expected = preds[len(prompt) - 1 :].tolist()
    assert out == expected


def test_two_slots_are_isolated(engine):
    """Decoding two different prompts in two slots must match decoding each
    alone."""
    p1 = np.array([3, 5, 7], np.int32)
    p2 = np.array([11, 13, 17, 19], np.int32)

    solo1 = engine.generate_stream(p1, 6)
    solo2 = engine.generate_stream(p2, 6)

    pre1, t1 = engine.prefill(p1, len(p1))
    pre2, t2 = engine.prefill(p2, len(p2))
    state = engine.init_decode_state()
    state = engine.insert(pre1, state, 0)
    state = engine.insert(pre2, state, 1)
    out1, out2 = [int(np.asarray(t1)[0])], [int(np.asarray(t2)[0])]
    for _ in range(5):
        state, toks = engine.generate(state)
        toks = np.asarray(toks)
        out1.append(int(toks[0]))
        out2.append(int(toks[1]))
    assert out1 == solo1
    assert out2 == solo2


def test_sampling_strategies():
    logits = jnp.array([[0.0, 0.0, 10.0, 0.0], [10.0, 0.0, 0.0, 0.0]])
    rng = jax.random.PRNGKey(0)
    assert sample_tokens(logits, rng, "greedy").tolist() == [2, 0]
    for strat in ("weighted", "topk", "nucleus"):
        toks = sample_tokens(logits, rng, strat, temperature=0.1, top_k=2, nucleus_p=0.9)
        assert toks.tolist() == [2, 0], strat
    # high temperature nucleus stays within the top-p set
    toks = sample_tokens(logits, rng, "nucleus", temperature=5.0, nucleus_p=0.5)
    assert toks.tolist() == [2, 0]


def test_chunked_prefill_matches_full(engine):
    """Chunked prefill must produce the same first token and decode path as
    full prefill (reference: benchmark_chunked_prefill correctness bar)."""
    import numpy as np

    prompt = np.array([3, 5, 7, 11, 13, 17, 19, 23, 29, 31], np.int32)
    full = engine.generate_stream(prompt, 6)

    prefix, first = engine.prefill_chunked(prompt, len(prompt), chunk_size=4)
    state = engine.init_decode_state()
    state = engine.insert(prefix, state, 0)
    out = [int(np.asarray(first)[0])]
    for _ in range(5):
        state, toks = engine.generate(state)
        out.append(int(np.asarray(toks)[0]))
    assert out == full


def test_prefill_concat_matches_separate(engine):
    """Packed multi-prompt prefill must reproduce per-prompt decode."""
    import numpy as np

    prompts = [np.array([3, 5, 7], np.int32), np.array([11, 13, 17, 19], np.int32)]
    solos = [engine.generate_stream(p, 5) for p in prompts]

    packed = engine.prefill_concat(prompts)
    state = engine.init_decode_state()
    outs = []
    for slot, (prefix, first) in enumerate(packed):
        state = engine.insert(prefix, state, slot)
        outs.append([int(np.asarray(first)[0])])
    for _ in range(4):
        state, toks = engine.generate(state)
        toks = np.asarray(toks)
        for slot in range(len(prompts)):
            outs[slot].append(int(toks[slot]))
    assert outs[0] == solos[0]
    assert outs[1] == solos[1]


def test_prefill_insert_many_matches_separate(engine):
    """Fused admission (one packed prefill + k inserts in one program) must
    reproduce the sequential prefill->insert->generate path exactly."""
    prompts = [np.array([3, 5, 7], np.int32), np.array([11, 13, 17, 19], np.int32)]
    solos = [engine.generate_stream(p, 5) for p in prompts]

    state = engine.init_decode_state()
    state, firsts = engine.prefill_insert_many(state, prompts, slots=[0, 1])
    firsts = np.asarray(firsts)
    outs = [[int(firsts[0])], [int(firsts[1])]]
    for _ in range(4):
        state, toks = engine.generate(state)
        toks = np.asarray(toks)
        for slot in range(len(prompts)):
            outs[slot].append(int(toks[slot]))
    assert outs[0] == solos[0]
    assert outs[1] == solos[1]


def test_prefill_insert_many_into_live_state(engine):
    """Fused admission into a state with a live stream must not disturb it."""
    live = np.array([23, 29, 31], np.int32)
    solo_live = engine.generate_stream(live, 6)
    new = np.array([37, 41], np.int32)
    solo_new = engine.generate_stream(new, 4)

    prefix, t0 = engine.prefill(live, len(live))
    state = engine.init_decode_state()
    state = engine.insert(prefix, state, 0)
    out_live = [int(np.asarray(t0)[0])]
    # live stream decodes two tokens before the fused admission lands
    for _ in range(2):
        state, toks = engine.generate(state)
        out_live.append(int(np.asarray(toks)[0]))
    state, firsts = engine.prefill_insert_many(state, [new], slots=[1])
    out_new = [int(np.asarray(firsts)[0])]
    for _ in range(3):
        state, toks = engine.generate(state)
        toks = np.asarray(toks)
        out_live.append(int(toks[0]))
        out_new.append(int(toks[1]))
    assert out_live == solo_live
    assert out_new == solo_new


def test_engine_aot_compile(engine):
    compiled = engine.aot_compile()
    assert set(compiled) == {"prefill", "generate"}
    for c in compiled.values():
        assert c.memory_analysis() is not None


def test_quantized_kv_cache_decode():
    """int8 KV cache: greedy decode stays close to the fp cache decode."""
    import numpy as np

    cfg_q = load_config(CFG + ["quantize_kvcache=true"])
    eng_q = Engine(cfg_q)
    eng_q.load_params()
    prompt = np.array([3, 5, 7, 11], np.int32)
    out_q = eng_q.generate_stream(prompt, 6)
    # cache variables really are int8
    prefix, _ = eng_q.prefill(prompt, len(prompt))
    leaves = jax.tree_util.tree_flatten_with_path(prefix["cache"])[0]
    kinds = {str(p[-1]): l.dtype for p, l in leaves}
    assert any("int8" in str(d) for d in kinds.values()), kinds
    # same params as unquantized engine -> outputs should mostly agree
    eng = Engine(load_config(CFG))
    eng.params = eng_q.params
    out = eng.generate_stream(prompt, 6)
    agree = sum(a == b for a, b in zip(out, out_q)) / len(out)
    assert agree >= 0.5, (out, out_q)


def test_single_slot_insert_preserves_prefix():
    """num_slots==1 regression: prefill cache leaves whose shapes equal the
    decode-state leaves (cache_index/segment) must still be inserted —
    previously they were silently skipped and decode restarted at position 0
    (reference maxengine insert: MaxText/maxengine.py bulk insert path)."""
    cfg = load_config(CFG + ["per_device_batch_size=0.125"])  # 1 slot on 8 dev
    eng = Engine(cfg)
    eng.load_params()
    assert eng.num_slots == 1
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = eng.generate_stream(prompt, 8)

    full = np.concatenate([prompt, np.array(out[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    positions = jnp.arange(tokens.shape[1])[None, :]
    segs = jnp.ones_like(tokens)
    logits = eng.model.apply({"params": eng.params}, tokens, positions, segs)
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    assert out == preds[len(prompt) - 1 :].tolist()


def test_int8_weight_only_serving():
    """quantization=int8w_serve: load float params, auto-convert kernels to
    int8 + per-channel scales, decode stays within quantization tolerance of
    the float engine (reference maxengine.py:318 quantize_params)."""
    cfg_f = load_config(CFG)
    eng_f = Engine(cfg_f)
    eng_f.load_params()

    cfg_q = load_config(CFG + ["quantization=int8w_serve"])
    eng_q = Engine(cfg_q)
    eng_q.load_params()

    # structure: every DenseGeneral kernel is int8 with a sibling scale
    leaves = jax.tree_util.tree_leaves_with_path(eng_q.params)
    int8_kernels = [p for p, x in leaves if x.dtype == jnp.int8]
    scales = [p for p, _ in leaves if "kernel_scale" in jax.tree_util.keystr(p)]
    assert len(int8_kernels) == len(scales) > 0

    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out_f = eng_f.generate_stream(prompt, 6)
    out_q = eng_q.generate_stream(prompt, 6)
    # greedy logits argmax under int8 noise: first couple of tokens must agree
    assert out_q[:2] == out_f[:2]

    # int8 engine must be self-consistent with the quantized forward
    full = np.concatenate([prompt, np.array(out_q[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    positions = jnp.arange(tokens.shape[1])[None, :]
    segs = jnp.ones_like(tokens)
    logits = eng_q.model.apply({"params": eng_q.params}, tokens, positions, segs)
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    assert out_q == preds[len(prompt) - 1 :].tolist()


def test_prefill_multisampling(engine):
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    cfg_strategy = engine.cfg.decode_sampling_strategy
    prefix, toks = engine.prefill_multisampling(prompt, 5, num_samples=4)
    assert toks.shape == (4,)
    if cfg_strategy == "greedy":
        assert len(set(toks.tolist())) == 1  # greedy: all samples identical
    assert "cache" in prefix


def test_lora_adapter_merge(engine):
    """Merging a zero adapter is identity; nonzero adapter changes logits."""
    import copy

    base = jax.tree.map(lambda x: x, engine.params)
    # engine params are in the unrolled serving layout (layers_0, layers_1)
    q_kernel = base["decoder"]["layers_0"]["self_attention_0"]["query"]["kernel"]
    r = 2
    flat_in = q_kernel.shape[0]
    flat_out = int(np.prod(q_kernel.shape[1:]))
    zeros = {
        "decoder": {"layers_0": {"self_attention_0": {"query": {
            "lora_a": jnp.zeros((flat_in, r), jnp.float32),
            "lora_b": jnp.zeros((r, flat_out), jnp.float32),
        }}}}
    }
    merged = Engine(engine.cfg, params=base).load_lora_adapter(zeros)
    np.testing.assert_allclose(
        merged["decoder"]["layers_0"]["self_attention_0"]["query"]["kernel"],
        q_kernel,
    )
    nonzero = jax.tree.map(lambda x: jnp.ones_like(x) * 0.01, zeros)
    merged2 = Engine(engine.cfg, params=base).load_lora_adapter(nonzero)
    assert not np.allclose(
        merged2["decoder"]["layers_0"]["self_attention_0"]["query"]["kernel"],
        q_kernel,
    )


def test_prefix_cache_reuse(engine):
    """Shared-prefix prompts must produce identical results with prefix
    caching, with the second request hitting the cache."""
    from maxtext_indextts2_tpu.infer.prefix_cache import PrefixCache

    pc = PrefixCache(chunk_size=8)
    shared = np.array([3, 5, 7, 11, 13, 17, 19, 23], np.int32)  # one chunk
    p1 = np.concatenate([shared, np.array([29, 31], np.int32)])
    p2 = np.concatenate([shared, np.array([37, 41], np.int32)])

    pref1, tok1 = engine.prefill_cached(p1, len(p1), pc)
    assert pc.stats()["misses"] == 1 and pc.stats()["entries"] == 1
    pref2, tok2 = engine.prefill_cached(p2, len(p2), pc)
    assert pc.stats()["hits"] == 1

    # parity: cached-resume result equals the plain full prefill
    ref1, rtok1 = engine.prefill(p1, len(p1))
    np.testing.assert_allclose(
        np.asarray(pref1["logits"]), np.asarray(ref1["logits"]), atol=2e-5
    )
    ref2, _ = engine.prefill(p2, len(p2))
    np.testing.assert_allclose(
        np.asarray(pref2["logits"]), np.asarray(ref2["logits"]), atol=2e-5
    )


@pytest.mark.parametrize(
    "block,extra",
    [
        ("llama2", []),
        ("mistral", ["sliding_window_size=8"]),
        ("gemma2", ["sliding_window_size=8", "attn_logits_soft_cap=50.0",
                    "final_logits_soft_cap=30.0"]),
        ("gemma3", ["sliding_window_size=8", "query_pre_attn_scalar=32"]),
        ("qwen3", []),
        ("gpt3", []),
        ("llama4", ["chunk_attn_window_size=8", "num_experts=4",
                    "num_experts_per_tok=1", "sparse_matmul=false",
                    "moe_mlp_dim=256"]),
        ("deepseek", ["q_lora_rank=32", "kv_lora_rank=32",
                      "qk_nope_head_dim=32", "qk_rope_head_dim=16",
                      "v_head_dim=32", "num_experts=1"]),
    ],
)
def test_engine_decode_matrix(block, extra):
    """Cached greedy decode must equal teacher-forced argmax for EVERY block
    style — sliding/chunked/NoPE/softcap/MoE/MLA all hit different decode
    masking paths (regression net for the single-slot and multi-sublayer
    cache bugs)."""
    n_layers = {
        "gemma2": 2, "gemma3": 6, "llama4": 4,
    }.get(block, 2)
    cfg = load_config([
        f"decoder_block={block}", "base_emb_dim=128", "base_mlp_dim=256",
        f"base_num_decoder_layers={n_layers}", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=32", "vocab_size=512",
        "max_target_length=64", "max_prefill_predict_length=16",
        "per_device_batch_size=0.125",  # 1 slot: the regression case
        "decode_sampling_strategy=greedy", "dtype=float32",
    ] + extra)
    eng = Engine(cfg)
    eng.load_params()
    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = eng.generate_stream(prompt, 12)  # crosses window/chunk = 8

    full = np.concatenate([prompt, np.array(out[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    positions = jnp.arange(tokens.shape[1])[None, :]
    segs = jnp.ones_like(tokens)
    logits = eng.model.apply({"params": eng.params}, tokens, positions, segs)
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    assert out == preds[len(prompt) - 1 :].tolist(), block


@pytest.mark.parametrize(
    "extra",
    [
        ["decoder_block=mistral", "sliding_window_size=8"],
        ["decoder_block=llama4", "chunk_attn_window_size=8", "num_experts=4",
         "num_experts_per_tok=1", "sparse_matmul=false", "moe_mlp_dim=256",
         "base_num_decoder_layers=4"],
    ],
)
def test_chunked_prefill_windowed_attention(extra):
    """Chunked prefill must apply sliding/chunked attention constraints —
    regression: the chunked mask was pure-causal, over-attending on
    windowed models."""
    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=32", "per_device_batch_size=0.125",
        "decode_sampling_strategy=greedy", "dtype=float32",
    ] + extra)
    eng = Engine(cfg)
    eng.load_params()
    prompt = np.random.default_rng(0).integers(1, 512, size=24).astype(np.int32)
    full, _ = eng.prefill(prompt, 24)
    chnk, _ = eng.prefill_chunked(prompt, 24, chunk_size=8)
    np.testing.assert_allclose(
        np.asarray(full["logits"]), np.asarray(chnk["logits"]), atol=2e-4
    )


def test_two_slots_mixed_lengths_gemma3():
    """Slot isolation on a multi-sublayer block (gemma3, 6 sublayers):
    two concurrent streams with different prompt lengths must each match
    their single-stream decode."""
    cfg = load_config([
        "decoder_block=gemma3", "sliding_window_size=8",
        "query_pre_attn_scalar=32", "base_emb_dim=128", "base_mlp_dim=256",
        "base_num_decoder_layers=6", "base_num_query_heads=4",
        "base_num_kv_heads=2", "head_dim=32", "vocab_size=512",
        "max_target_length=64", "max_prefill_predict_length=16",
        "per_device_batch_size=0.25",  # 2 slots
        "decode_sampling_strategy=greedy", "dtype=float32",
    ])
    eng = Engine(cfg)
    eng.load_params()
    p1 = np.array([3, 5, 7, 11, 13, 17, 19], np.int32)
    p2 = np.array([23, 29, 31], np.int32)

    solo1 = eng.generate_stream(p1, 8)
    solo2 = eng.generate_stream(p2, 8)

    state = eng.init_decode_state()
    pref1, t1 = eng.prefill(p1, len(p1))
    state = eng.insert(pref1, state, 0)
    pref2, t2 = eng.prefill(p2, len(p2))
    state = eng.insert(pref2, state, 1)
    out1 = [int(np.asarray(t1)[0])]
    out2 = [int(np.asarray(t2)[0])]
    for _ in range(7):
        state, toks = eng.generate(state)
        out1.append(int(np.asarray(toks)[0]))
        out2.append(int(np.asarray(toks)[1]))
    assert out1 == solo1
    assert out2 == solo2


@pytest.mark.parametrize("extra", [[], ["quantize_kvcache=true"]],
                         ids=["bf16_kv", "int8_kv"])
def test_bucketed_decode_matches_masked(extra):
    """decode_attention=bucketed (lax.switch over power-of-two KV prefixes)
    must emit the same greedy stream as the full masked path — the switch
    only changes how much of the cache is read, never which positions are
    attended. max_target_length=640 exercises a non-power-of-two final
    bucket and at least two switch branches as the stream grows."""
    base = [
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=640",
        "max_prefill_predict_length=256", "per_device_batch_size=0.125",
        "decode_sampling_strategy=greedy",
    ] + extra
    prompt = (np.arange(1, 301, dtype=np.int32) % 511) + 1

    eng_m = Engine(load_config(base))
    eng_m.load_params()
    # prompt longer than the prefill bucket -> chunked prefill start
    want = []
    prefix, first = eng_m.prefill_chunked(prompt, len(prompt), 256)
    state = eng_m.init_decode_state()
    state = eng_m.insert(prefix, state, 0)
    want.append(int(np.asarray(first)[0]))
    for _ in range(40):
        state, toks = eng_m.generate(state)
        want.append(int(np.asarray(toks)[0]))

    eng_b = Engine(load_config(base + ["decode_attention=bucketed"]))
    eng_b.load_params()
    got = []
    prefix, first = eng_b.prefill_chunked(prompt, len(prompt), 256)
    state = eng_b.init_decode_state()
    state = eng_b.insert(prefix, state, 0)
    got.append(int(np.asarray(first)[0]))
    for _ in range(40):
        state, toks = eng_b.generate(state)
        got.append(int(np.asarray(toks)[0]))

    assert got == want


def test_serve_unroll_scanned_checkpoint_parity(tmp_path):
    """A scan-trained checkpoint served with serve_unroll_layers (the
    default) must decode identically to serving with the scanned module
    layout. Unrolled decode avoids the per-layer cache dynamic-slice/copy
    round-trip (2.7x step-time win on-chip; PERF.md)."""
    import flax.linen as nn

    from maxtext_indextts2_tpu.train.checkpointing import save_params_only

    cfg_args = CFG + ["scan_layers=true"]
    cfg = load_config(cfg_args)
    scan_model = Transformer(cfg=cfg)
    dummy = jnp.zeros((1, cfg.max_prefill_predict_length), jnp.int32)
    params = nn.meta.unbox(
        scan_model.init(
            jax.random.PRNGKey(cfg.init_weights_seed), dummy, dummy, dummy
        )["params"]
    )
    path = str(tmp_path / "ckpt")
    save_params_only(path, params)

    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    eng_scan = Engine(load_config(cfg_args + ["serve_unroll_layers=false"]))
    assert not eng_scan._ckpt_scanned
    eng_scan.load_params(path)
    want = eng_scan.generate_stream(prompt, 8)

    eng_unroll = Engine(load_config(cfg_args))
    assert eng_unroll._ckpt_scanned  # module layout unrolled, ckpt scanned
    eng_unroll.load_params(path)
    got = eng_unroll.generate_stream(prompt, 8)
    assert got == want


def test_serve_unrolled_trained_checkpoint(tmp_path):
    """A checkpoint trained with scan_layers=false (the 220M perf recipe)
    stores unrolled layers; an engine with the default config (scan_layers
    true + serve_unroll_layers) must detect the on-disk layout instead of
    trying to restore a scanned twin."""
    import flax.linen as nn

    from maxtext_indextts2_tpu.train.checkpointing import (
        params_checkpoint_is_scanned,
        save_params_only,
    )

    un_cfg = load_config(CFG + ["scan_layers=false"])
    un_model = Transformer(cfg=un_cfg)
    dummy = jnp.zeros((1, un_cfg.max_prefill_predict_length), jnp.int32)
    params = nn.meta.unbox(
        un_model.init(
            jax.random.PRNGKey(un_cfg.init_weights_seed), dummy, dummy, dummy
        )["params"]
    )
    path = str(tmp_path / "unrolled_ckpt")
    save_params_only(path, params)
    assert params_checkpoint_is_scanned(path) is False

    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    eng_direct = Engine(load_config(CFG + ["scan_layers=false"]))
    eng_direct.load_params(path)
    want = eng_direct.generate_stream(prompt, 8)

    eng_default = Engine(load_config(CFG + ["scan_layers=true"]))
    assert eng_default._ckpt_scanned  # convention says scanned...
    eng_default.load_params(path)  # ...but the checkpoint says unrolled
    got = eng_default.generate_stream(prompt, 8)
    assert got == want

    # reverse direction: a SCANNED-module engine (serve_unroll_layers=false,
    # e.g. deep models kept scanned for compile time) must stack the
    # unrolled checkpoint into its layout
    eng_scan = Engine(
        load_config(CFG + ["scan_layers=true", "serve_unroll_layers=false"])
    )
    assert not eng_scan._ckpt_scanned and eng_scan.cfg.scan_layers
    eng_scan.load_params(path)
    got_scan = eng_scan.generate_stream(prompt, 8)
    assert got_scan == want


def test_engine_tensor_parallel_decode_parity():
    """Serving with the weights tensor-sharded over the mesh
    (ici_tensor_parallelism=2) decodes the same stream as the replicated
    engine — the multi-chip serving path the v5e-8 capacity estimates
    assume (plus per-slot batch sharding over the data axis)."""
    prompt = np.array([3, 5, 7, 11, 13], np.int32)

    eng_rep = Engine(load_config(CFG))
    eng_rep.load_params()
    want = eng_rep.generate_stream(prompt, 8)

    eng_tp = Engine(load_config(CFG + ["ici_tensor_parallelism=2"]))
    eng_tp.load_params()
    got = eng_tp.generate_stream(prompt, 8)
    assert got == want

    # weights really are tensor-sharded (shard shape smaller than global)
    k = eng_tp.params["decoder"]["layers_0"]["mlp_0"]["wi_0"]["kernel"]
    assert k.sharding.shard_shape(k.shape) != k.shape, \
        "mlp kernel should be tensor-sharded"


def test_serve_params_dtype_bf16_cast():
    """serve_params_dtype=bfloat16 casts float32 weights at load but keeps
    quantization scales in f32; decode still matches teacher forcing."""
    cfg = load_config(CFG + ["serve_params_dtype=bfloat16"])
    eng = Engine(cfg)
    eng.load_params()
    leaves = jax.tree_util.tree_leaves_with_path(eng.params)
    # every large tensor (the HBM stream) is bf16; "scale"-named leaves
    # (norm weights / quant scales) deliberately stay f32
    big_f32 = [jax.tree_util.keystr(p) for p, x in leaves
               if x.dtype == jnp.float32 and x.size > 4096]
    assert not big_f32, big_f32
    assert any(x.dtype == jnp.bfloat16 for _, x in leaves)

    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    out = eng.generate_stream(prompt, 6)
    full = np.concatenate([prompt, np.array(out[:-1], np.int32)])
    tokens = jnp.asarray(full)[None, :]
    logits = eng.model.apply(
        {"params": eng.params}, tokens,
        jnp.arange(tokens.shape[1])[None, :], jnp.ones_like(tokens),
    )
    preds = np.asarray(jnp.argmax(logits[0], axis=-1))
    assert out == preds[len(prompt) - 1 :].tolist()


def test_serve_params_dtype_keeps_quant_scales():
    """int8w_serve + bf16 cast: int8 kernels untouched, scales stay f32."""
    cfg = load_config(CFG + ["quantization=int8w_serve",
                             "serve_params_dtype=bfloat16"])
    eng = Engine(cfg)
    eng.load_params()
    leaves = jax.tree_util.tree_leaves_with_path(eng.params)
    scales = [x for p, x in leaves
              if "scale" in jax.tree_util.keystr(p).lower()]
    assert scales and all(x.dtype == jnp.float32 for x in scales)
    assert any(x.dtype == jnp.int8 for _, x in leaves)


def test_paged_decode_matches_dense():
    """cfg.paged_attention=true routes decode through the paged KV cache
    (page pool + PageState); greedy decode must match the dense-cache engine
    token for token (reference capability:
    MaxText/inference/paged_attention.py:99)."""
    dense = Engine(load_config(CFG))
    dense.load_params()
    paged_cfg = load_config(CFG + [
        "paged_attention=true",
        "pagedattn_num_pages=32",
        "pagedattn_tokens_per_page=8",
    ])
    paged = Engine(paged_cfg, mesh=dense.mesh, model=None, params=None)
    paged.params = dense.params  # identical weights

    state = paged.init_decode_state()
    assert "page_state" in state
    assert any(
        "key_pages" in jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(state["cache"])
    ), "paged decode state must hold page pools, not dense buffers"

    prompt_a = np.array([3, 5, 7, 11, 13], np.int32)
    prompt_b = np.array([2, 4, 6], np.int32)
    want_a = dense.generate_stream(prompt_a, 10)
    want_b = dense.generate_stream(prompt_b, 10)

    # two slots decoding concurrently through the shared page pool
    pre_a, _ = paged.prefill(prompt_a, len(prompt_a))
    pre_b, _ = paged.prefill(prompt_b, len(prompt_b))
    state = paged.insert(pre_a, state, 0)
    state = paged.insert(pre_b, state, 1)
    got_a = [int(np.asarray(pre_a["token"])[0])]
    got_b = [int(np.asarray(pre_b["token"])[0])]
    for _ in range(9):
        state, toks = paged.generate(state)
        got_a.append(int(np.asarray(toks)[0]))
        got_b.append(int(np.asarray(toks)[1]))
    assert got_a == want_a
    assert got_b == want_b


def test_paged_pages_grow_across_boundaries():
    """Decoding past a page boundary allocates new pages and stays correct
    (covers allocate_decode_step growth inside the serving loop)."""
    cfg = load_config(CFG + [
        "paged_attention=true",
        "pagedattn_num_pages=32",
        "pagedattn_tokens_per_page=4",  # prompt 5 -> 2 pages; +8 tokens -> 4
    ])
    dense = Engine(load_config(CFG))
    dense.load_params()
    paged = Engine(cfg, mesh=dense.mesh)
    paged.params = dense.params

    prompt = np.array([3, 5, 7, 11, 13], np.int32)
    want = dense.generate_stream(prompt, 8)
    got = paged.generate_stream(prompt, 8)
    assert got == want


def test_engine_context_autoregressive_decode_parity():
    """Inference with the KV cache SEQUENCE-sharded over the
    context_autoregressive mesh axis (reference: base.yml:318,405,417) —
    greedy decode must match the replicated engine, and the decode-state
    cache buffers must actually be sharded along their sequence dim.

    Only decode_attention=dot_product supports this (GSPMD partitions the
    attention contraction and inserts the softmax collectives); the Pallas
    ragged/paged kernels hold full per-slot caches under shard_map and are
    guarded off in Engine.__init__."""
    prompt = np.array([3, 5, 7, 11, 13], np.int32)

    eng_rep = Engine(load_config(CFG))
    eng_rep.load_params()
    want = eng_rep.generate_stream(prompt, 8)

    cfg = load_config(CFG + ["ici_context_autoregressive_parallelism=2",
                             "ici_fsdp_parallelism=4"])
    eng = Engine(cfg)
    eng.load_params()
    got = eng.generate_stream(prompt, 8)
    assert got == want

    # The steady-state decode program's output cache must be physically
    # sequence-sharded (init_decode_state alone is single-device until the
    # first dispatch propagates the constraint).
    state = eng.init_decode_state()
    pre, _ = eng.prefill(prompt, len(prompt))
    state = eng.insert(pre, state, 0)
    state, _ = eng.generate(state)
    keys = [
        leaf for path, leaf in jax.tree_util.tree_leaves_with_path(state["cache"])
        if "cached_key" in jax.tree_util.keystr(path)
    ]
    assert keys, "decode state should hold dense KV buffers"
    for k in keys:
        # [slots, max_len, nkv, d]: sequence dim (1) split over the
        # 2-way context_autoregressive axis
        shard = k.sharding.shard_shape(k.shape)
        assert shard[1] == k.shape[1] // 2, (
            f"cache sequence dim not sharded: global {k.shape}, shard {shard}"
        )


def test_engine_context_autoregressive_guards():
    cfg = load_config(CFG + ["ici_context_autoregressive_parallelism=2",
                             "ici_fsdp_parallelism=4",
                             "decode_attention=ragged"])
    with pytest.raises(AssertionError, match="dot_product"):
        Engine(cfg)
    cfg = load_config(CFG + ["ici_context_autoregressive_parallelism=2",
                             "ici_fsdp_parallelism=4",
                             "paged_attention=true", "scan_layers=false"])
    with pytest.raises(AssertionError, match="paged"):
        Engine(cfg)
