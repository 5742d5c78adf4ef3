"""Tokenizer training: SentencePiece when available, byte-vocab fallback.

Reference: MaxText/train_tokenizer.py (SentencePiece BPE training over a
text corpus). The image this framework targets does not ship the
`sentencepiece` trainer, so the CLI gates on the import and otherwise
builds a frequency-ranked byte/char vocab JSON usable by
data/tokenizer.py's VocabTokenizer path — enough to bootstrap experiments
until a real SP model is supplied.

Usage:
  python -m maxtext_indextts2_tpu.train.data.train_tokenizer \
      corpus=<txt> out=<prefix> [vocab_size=N] [model_type=bpe|unigram]
"""

from __future__ import annotations

import collections
import json
import sys


def train_sentencepiece(corpus: str, out: str, vocab_size: int, model_type: str):
    import sentencepiece as spm  # gated: not in the default image

    spm.SentencePieceTrainer.train(
        input=corpus,
        model_prefix=out,
        vocab_size=vocab_size,
        model_type=model_type,
        character_coverage=1.0,
    )
    return {"backend": "sentencepiece", "model": f"{out}.model"}


def train_byte_vocab(corpus: str, out: str, vocab_size: int):
    """Frequency-ranked character vocab with byte fallback slots 0-258."""
    counts: collections.Counter = collections.Counter()
    with open(corpus, encoding="utf-8") as f:
        for line in f:
            counts.update(line)
    specials = ["<pad>", "<bos>", "<eos>"]
    chars = [c for c, _ in counts.most_common(max(vocab_size - len(specials), 0))]
    vocab = {tok: i for i, tok in enumerate(specials + chars)}
    path = f"{out}.vocab.json"
    with open(path, "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False)
    return {"backend": "byte_vocab", "model": path, "actual_vocab": len(vocab)}


def main(argv=None) -> dict:
    argv = list(sys.argv[1:] if argv is None else argv)
    kv = dict(a.split("=", 1) for a in argv)
    corpus, out = kv["corpus"], kv["out"]
    vocab_size = int(kv.get("vocab_size", 1024))
    model_type = kv.get("model_type", "bpe")
    try:
        result = train_sentencepiece(corpus, out, vocab_size, model_type)
    except ImportError:
        result = train_byte_vocab(corpus, out, vocab_size)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
