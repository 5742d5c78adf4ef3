"""Grain-based deterministic data pipeline.

Reference: MaxText/input_pipeline/_grain_data_processing.py:93 (ArrayRecord/
Parquet deterministic pipeline whose iterator state checkpoints with the
model). Here: a grain MapDataset over JSONL/text shards -> tokenize -> pack,
with get_state/set_state plumbed through so the train checkpoint can resume
the data stream exactly.
"""

from __future__ import annotations

import json
import os

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.train.data.packing import PackedBatcher
from maxtext_indextts2_tpu.train.data.tokenizer import build_tokenizer


class GrainTextSource:
    """Random-access source over JSONL files ({"text": ...} per line)."""

    def __init__(self, paths: list[str]):
        self.records: list[tuple[str, int, int]] = []  # (path, offset, length)
        for path in paths:
            with open(path, "rb") as f:
                off = 0
                for line in f:
                    self.records.append((path, off, len(line)))
                    off += len(line)

    def __len__(self):
        return len(self.records)

    def __getitem__(self, idx: int) -> str:
        path, off, ln = self.records[idx]
        with open(path, "rb") as f:
            f.seek(off)
            raw = f.read(ln)
        obj = json.loads(raw)
        return obj.get("text") or obj.get("content") or ""


def make_grain_iterator(cfg: Config, process_index: int = 0, process_count: int = 1):
    import grain.python as grain

    paths = sorted(
        os.path.join(cfg.dataset_path, p)
        for p in os.listdir(cfg.dataset_path)
        if p.endswith((".jsonl", ".json"))
    ) if os.path.isdir(cfg.dataset_path) else [cfg.dataset_path]
    source = GrainTextSource(paths)
    tokenizer = build_tokenizer(cfg)

    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.ShardOptions(
            shard_index=process_index, shard_count=process_count, drop_remainder=True
        ),
        shuffle=cfg.enable_data_shuffling,
        num_epochs=cfg.num_epochs,
        seed=cfg.data_shuffle_seed,
    )

    class _Tokenize(grain.MapTransform):
        def map(self, text):
            return tokenizer.encode(text)

    loader = grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[_Tokenize()],
        worker_count=0,
    )
    it = iter(loader)
    batch = cfg.global_batch_size_to_load // process_count
    return GrainPackedIterator(it, batch, cfg.max_target_length, cfg.packing)


class GrainPackedIterator(PackedBatcher):
    """PackedBatcher + grain iterator state checkpointing."""

    def __init__(self, grain_iter, batch, max_len, pack):
        self._grain_iter = grain_iter
        super().__init__(grain_iter, batch, max_len, pack)

    def get_state(self) -> bytes:
        import pickle

        if hasattr(self._grain_iter, "get_state"):
            return pickle.dumps(self._grain_iter.get_state())
        return b""

    def set_state(self, state: bytes):
        import pickle

        if state and hasattr(self._grain_iter, "set_state"):
            self._grain_iter.set_state(pickle.loads(state))
