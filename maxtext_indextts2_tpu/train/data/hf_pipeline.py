"""HuggingFace text-dataset pipeline (reference:
input_pipeline/_hf_data_processing.py:35): streaming dataset -> tokenize ->
pack -> batches."""

from __future__ import annotations

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.train.data.packing import PackedBatcher
from maxtext_indextts2_tpu.train.data.tokenizer import build_tokenizer


def make_hf_iterator(cfg: Config, process_index: int = 0, process_count: int = 1):
    from datasets import load_dataset

    tokenizer = build_tokenizer(cfg)
    ds = load_dataset(cfg.dataset_path, split="train", streaming=True)
    if cfg.enable_data_shuffling:
        ds = ds.shuffle(seed=cfg.data_shuffle_seed, buffer_size=10_000)
    if process_count > 1:
        ds = ds.shard(num_shards=process_count, index=process_index)

    def gen():
        for ex in ds:
            text = ex.get("text") or ex.get("content") or ""
            if text:
                yield tokenizer.encode(text)

    batch = cfg.global_batch_size_to_load // process_count
    return PackedBatcher(gen(), batch, cfg.max_target_length, pack=cfg.packing)
