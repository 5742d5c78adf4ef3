"""Serving accuracy eval tests (reference: inference_mlperf/evaluate-accuracy.py).

Unit-level metric math plus the integration contract: the offline engine's
batched continuous-batching outputs scored against single-stream decode
goldens must be exact (greedy decoding, same weights) — any drop below 1.0
is a serving-path correctness bug, which is exactly what the accuracy half
of the MLPerf discipline exists to catch."""

import numpy as np
import pytest

from maxtext_indextts2_tpu.utils.accuracy_eval import evaluate_outputs


def test_identical_sequences_score_one():
    pool = [[1, 2, 3], [4, 5], list(range(50))]
    out = evaluate_outputs(pool, [list(p) for p in pool])
    for k in ("exact_match", "rouge1", "rouge2", "rougeL", "token_f1"):
        assert out[k] == 1.0, k
    assert out["num_samples"] == 3


def test_disjoint_sequences_score_zero():
    out = evaluate_outputs([[1, 2, 3]], [[4, 5, 6]])
    for k in ("exact_match", "rouge1", "rouge2", "rougeL", "token_f1"):
        assert out[k] == 0.0, k


def test_rouge_l_known_value():
    # pred [1,9,2,9,3] vs gold [1,2,3]: LCS=3, P=3/5, R=1 -> F1=0.75
    out = evaluate_outputs([[1, 9, 2, 9, 3]], [[1, 2, 3]])
    assert out["rougeL"] == pytest.approx(0.75)
    assert out["exact_match"] == 0.0
    # unigram overlap 3: P=3/5, R=3/3 -> rouge1 F1=0.75 too
    assert out["rouge1"] == pytest.approx(0.75)


def test_rouge2_order_sensitivity():
    # same bag of tokens, different order: rouge1/token_f1 stay 1.0 but
    # rouge2/rougeL drop — ordering errors must be visible
    out = evaluate_outputs([[1, 2, 3, 4]], [[4, 3, 2, 1]])
    assert out["rouge1"] == 1.0
    assert out["token_f1"] == 1.0
    assert out["rouge2"] == 0.0
    assert out["rougeL"] < 1.0


def test_strings_split_like_reference():
    out = evaluate_outputs(["the cat sat"], ["the cat sat"])
    assert out["exact_match"] == 1.0
    out = evaluate_outputs(["the cat"], ["the cat sat"])
    assert out["exact_match"] == 0.0
    assert out["rouge1"] == pytest.approx(0.8)  # P=1, R=2/3


def test_mismatched_pool_raises():
    with pytest.raises(ValueError):
        evaluate_outputs([[1]], [[1], [2]])
    with pytest.raises(ValueError):
        evaluate_outputs([], [])


def test_offline_engine_accuracy_vs_single_stream_goldens():
    """The end-to-end contract: mlperf_offline accuracy mode scores 1.0 on
    all metrics because batched and single-stream greedy decode agree."""
    import benchmarks.mlperf_offline as mlperf

    result = mlperf.run(["num_queries=4", "max_new=6", "accuracy=1"])
    acc = result["accuracy"]
    assert acc["num_samples"] == 4
    for k in ("exact_match", "rouge1", "rouge2", "rougeL", "token_f1"):
        assert acc[k] == 1.0, (k, acc)


def test_goldens_file_roundtrip(tmp_path):
    """goldens=path branch: regenerate the harness's deterministic query
    pool, decode it single-stream into a golden file, then let the harness
    score its batched outputs against that file — must be exact."""
    import json

    import benchmarks.mlperf_offline as mlperf
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine

    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=2", "head_dim=32",
        "vocab_size=512", "max_target_length=64",
        "max_prefill_predict_length=16", "per_device_batch_size=0.25",
        "decode_sampling_strategy=greedy", "dtype=float32",
    ])
    rng = np.random.default_rng(0)  # harness pool seed
    lengths = rng.integers(4, cfg.max_prefill_predict_length, size=3)
    pool = [rng.integers(1, cfg.vocab_size, size=int(n)).astype(np.int32)
            for n in lengths]
    eng = Engine(cfg)
    eng.load_params()
    goldens = [eng.generate_stream(p, 5) for p in pool]
    golden_path = tmp_path / "goldens.json"
    golden_path.write_text(json.dumps(goldens))

    scored = mlperf.run(["num_queries=3", "max_new=5",
                         f"goldens={golden_path}"])
    assert scored["accuracy"]["exact_match"] == 1.0
