"""Serving accuracy evaluation: ROUGE / exact-match over engine outputs.

Reference capability: MaxText/inference_mlperf/evaluate-accuracy.py — the
accuracy half of the MLPerf-inference discipline: the SUT's generated
sequences are scored against reference outputs with ROUGE metrics, and a
submission only counts if accuracy stays above a threshold while the latency
benchmark runs. The reference delegates to the ``evaluate``/``nltk`` rouge
implementation over detokenized strings; this framework serves token-id
streams, so the scorer here is dependency-free and operates on any sequence
(token ids or whitespace-split words give identical math).

Metrics:
- ``exact_match``: fraction of outputs identical to their golden,
- ``rouge1`` / ``rouge2``: unigram / bigram overlap F1,
- ``rougeL``: longest-common-subsequence F1 (the headline MLPerf metric),
- ``token_f1``: bag-of-tokens F1 (SQuAD-style).

All are means over the pool, in [0, 1].
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Sequence


def _f1(p: float, r: float) -> float:
    return 0.0 if p + r == 0 else 2 * p * r / (p + r)


def _ngram_f1(pred: Sequence, gold: Sequence, n: int) -> float:
    if len(pred) < n or len(gold) < n:
        return 1.0 if list(pred) == list(gold) else 0.0
    pc = Counter(tuple(pred[i : i + n]) for i in range(len(pred) - n + 1))
    gc = Counter(tuple(gold[i : i + n]) for i in range(len(gold) - n + 1))
    overlap = sum((pc & gc).values())
    return _f1(overlap / sum(pc.values()), overlap / sum(gc.values()))


def _lcs_len(a: Sequence, b: Sequence) -> int:
    """O(len(a)*len(b)) LCS with a rolling row (sequences are ~hundreds of
    tokens; no need for Hirschberg/hunting tricks)."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def _rouge_l(pred: Sequence, gold: Sequence) -> float:
    if not pred or not gold:
        return 1.0 if list(pred) == list(gold) else 0.0
    lcs = _lcs_len(pred, gold)
    return _f1(lcs / len(pred), lcs / len(gold))


def _token_f1(pred: Sequence, gold: Sequence) -> float:
    if not pred or not gold:
        return 1.0 if list(pred) == list(gold) else 0.0
    overlap = sum((Counter(pred) & Counter(gold)).values())
    return _f1(overlap / len(pred), overlap / len(gold))


def _as_tokens(x) -> list:
    """Strings split on whitespace (reference scores detokenized text);
    everything else is treated as a token sequence."""
    return x.split() if isinstance(x, str) else list(x)


def evaluate_outputs(predictions: Sequence, goldens: Sequence) -> dict:
    """Score a pool of generated sequences against reference outputs.

    Returns mean exact_match / rouge1 / rouge2 / rougeL / token_f1 plus the
    pool size. Raises on length mismatch — a missing output is a harness
    bug, not a 0-score sample.
    """
    if len(predictions) != len(goldens):
        raise ValueError(
            f"{len(predictions)} predictions vs {len(goldens)} goldens"
        )
    n = len(predictions)
    if n == 0:
        raise ValueError("empty evaluation pool")
    sums = Counter()
    for pred, gold in zip(predictions, goldens):
        p, g = _as_tokens(pred), _as_tokens(gold)
        sums["exact_match"] += float(p == g)
        sums["rouge1"] += _ngram_f1(p, g, 1)
        sums["rouge2"] += _ngram_f1(p, g, 2)
        sums["rougeL"] += _rouge_l(p, g)
        sums["token_f1"] += _token_f1(p, g)
    out = {k: round(v / n, 6) for k, v in sums.items()}
    out["num_samples"] = n
    return out
