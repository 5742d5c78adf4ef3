"""Exercise the gated-dependency code paths with stub modules.

The image lacks sentencepiece/tiktoken/tensorflow_datasets, so their import
branches normally only run as clear ImportError gates. These tests inject
minimal stand-ins into sys.modules so the REAL wrapper code (argument
plumbing, bos/eos handling, shard/shuffle logic) executes — the fallback the
reference covers with its installed deps (MaxText/tokenizer.py:33,187,
_tfds_data_processing.py:80)."""

import sys
import types

import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.train.data.tokenizer import build_tokenizer


class _FakeSP:
    def __init__(self, model_file):
        assert model_file == "/fake/spm.model"

    def encode(self, text):
        return [10 + (b % 50) for b in text.encode()]

    def decode(self, ids):
        return "<decoded>"

    def bos_id(self):
        return 1

    def eos_id(self):
        return 2

    def vocab_size(self):
        return 32000


def test_sentencepiece_wrapper_path(monkeypatch):
    mod = types.ModuleType("sentencepiece")
    mod.SentencePieceProcessor = _FakeSP
    monkeypatch.setitem(sys.modules, "sentencepiece", mod)
    cfg = load_config([
        "tokenizer_type=sentencepiece", "tokenizer_path=/fake/spm.model",
    ])
    tok = build_tokenizer(cfg)
    ids = tok.encode("hi")
    assert ids[0] == 1 and ids[-1] == 2  # bos/eos wrapping is the wrapper's job
    assert tok.vocab_size == 32000
    assert tok.decode(ids) == "<decoded>"


def test_tiktoken_wrapper_path(monkeypatch):
    class _Enc:
        n_vocab = 100277

        def encode(self, text):
            return [len(text)]

        def decode(self, ids):
            return "x" * ids[0]

    mod = types.ModuleType("tiktoken")
    mod.get_encoding = lambda name: (_Enc() if name == "cl100k_base" else None)
    monkeypatch.setitem(sys.modules, "tiktoken", mod)
    cfg = load_config(["tokenizer_type=tiktoken"])  # default encoding name
    tok = build_tokenizer(cfg)
    assert tok.vocab_size == 100277
    assert tok.decode(tok.encode("abcd")) == "xxxx"  # round-trips through _Enc


def test_tfds_source_path(monkeypatch):
    """The real _tfds_examples shard/shuffle logic over a fake data_source."""
    records = [{"text": f"record {i}".encode()} for i in range(10)]

    mod = types.ModuleType("tensorflow_datasets")

    def data_source(name, data_dir=None):
        assert name == "c4/en"
        assert data_dir == "/fake/dir"
        return {"train": records}

    mod.data_source = data_source
    monkeypatch.setitem(sys.modules, "tensorflow_datasets", mod)

    from maxtext_indextts2_tpu.train.data.tfds_pipeline import make_tfds_iterator

    cfg = load_config([
        "dataset_type=tfds", "dataset_path=c4/en@/fake/dir",
        "per_device_batch_size=0.25", "max_target_length=32",
        "enable_data_shuffling=false",
    ])
    it = make_tfds_iterator(cfg)
    b = next(it)
    assert b["inputs"].shape == (cfg.global_batch_size_to_load, 32)
    assert (b["inputs_segmentation"] > 0).any()


def test_tfds_missing_dep_error(monkeypatch):
    monkeypatch.delitem(sys.modules, "tensorflow_datasets", raising=False)
    monkeypatch.setattr(
        "builtins.__import__",
        _block_import("tensorflow_datasets"),
    )
    from maxtext_indextts2_tpu.train.data.tfds_pipeline import _tfds_examples

    cfg = load_config(["dataset_type=tfds", "dataset_path=c4/en"])
    with pytest.raises(ImportError, match="tensorflow_datasets"):
        next(_tfds_examples(cfg, 0, 1))


def _block_import(name):
    real = __import__

    def fake(mod, *a, **kw):
        if mod == name:
            raise ImportError(f"No module named '{name}'")
        return real(mod, *a, **kw)

    return fake
