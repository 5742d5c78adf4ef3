"""MMLU-style multiple-choice accuracy eval via choice log-likelihood.

Reference: benchmarks/mmlu/ in the upstream repo (accuracy eval over the
57-subject MMLU set). Scoring: for each item, append every choice to the
prompt, sum the per-token log-probs of the choice continuation under the
model, and pick the argmax — the standard lm-eval-harness protocol.

Offline-friendly: pass dataset_path=<jsonl> with rows
  {"question": str, "choices": [str, ...], "answer": int}
or run without it to score the embedded smoke set (sanity only).

Usage:  python benchmarks/mmlu.py [dataset_path=...] [limit=N] [key=value ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

_SMOKE_SET = [
    {"question": "2 + 2 =", "choices": ["3", "4", "5", "22"], "answer": 1},
    {"question": "The chemical symbol for water is",
     "choices": ["CO2", "H2O", "NaCl", "O2"], "answer": 1},
    {"question": "The capital of France is",
     "choices": ["Berlin", "Madrid", "Paris", "Rome"], "answer": 2},
    {"question": "A prime number divisible by 3 is",
     "choices": ["9", "6", "3", "12"], "answer": 2},
]


def _loglikelihood(model, params, cfg, prompt_ids, choice_ids):
    """Sum log p(choice tokens | prompt + preceding choice tokens)."""
    full = prompt_ids + choice_ids
    s = min(len(full), cfg.max_target_length)
    full = full[-s:]
    tokens = jnp.asarray(full, jnp.int32)[None, :]
    positions = jnp.arange(s)[None, :]
    segs = jnp.ones((1, s), jnp.int32)
    logits = model.apply({"params": params}, tokens, positions, segs)
    logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
    n = len(choice_ids)
    # token at position i is predicted by logits at i-1
    idx = jnp.arange(s - n, s)
    tok = tokens[0, idx]
    return float(jnp.sum(logp[idx - 1, tok]))


def run(argv=None) -> dict:
    from maxtext_indextts2_tpu.config import load_config
    from maxtext_indextts2_tpu.infer.engine import Engine
    from maxtext_indextts2_tpu.train.data.tokenizer import ByteTokenizer

    argv = list(argv or [])
    dataset_path, limit = "", 0
    keep = []
    for a in argv:
        if a.startswith("dataset_path="):
            dataset_path = a.split("=", 1)[1]
        elif a.startswith("limit="):
            limit = int(a.split("=", 1)[1])
        else:
            keep.append(a)

    cfg = load_config([
        "base_emb_dim=128", "base_mlp_dim=256", "base_num_decoder_layers=2",
        "base_num_query_heads=4", "base_num_kv_heads=4", "head_dim=32",
        "vocab_size=512", "max_target_length=256", "per_device_batch_size=1",
    ] + keep)
    eng = Engine(cfg)
    eng.load_params()
    tok = ByteTokenizer(add_bos=True, add_eos=False)

    items = (
        [json.loads(l) for l in open(dataset_path)] if dataset_path else _SMOKE_SET
    )
    if limit:
        items = items[:limit]

    correct = 0
    for item in items:
        prompt = tok.encode(f"Question: {item['question']}\nAnswer:")
        scores = [
            _loglikelihood(eng.model, eng.params, cfg, prompt, tok.encode(" " + c)[1:])
            for c in item["choices"]
        ]
        correct += int(int(np.argmax(scores)) == item["answer"])

    acc = correct / max(len(items), 1)
    return {
        "metric": "mmlu_accuracy",
        "value": round(acc, 4),
        "unit": "fraction",
        "detail": {"n_items": len(items), "dataset": dataset_path or "smoke"},
    }


if __name__ == "__main__":
    print(json.dumps(run(sys.argv[1:])))
