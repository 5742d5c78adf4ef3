"""Supervised fine-tuning: loss masked to completion tokens only.

Reference: MaxText/sft_trainer.py (:56 data handling with chat templates,
:152 train wrapper) + _input_pipeline_utils.py SFT prompt masking. Reuses the
core train loop; the only difference is the data: rows where
``targets_segmentation`` is zeroed over prompt positions so CE ignores them.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np

from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.train.data.packing import finalize_row
from maxtext_indextts2_tpu.train.data.tokenizer import build_tokenizer


def mask_prompt_targets(row: dict, prompt_len: int) -> dict:
    """Zero the loss weights over the prompt region of an (unpacked) row."""
    tseg = row["targets_segmentation"].copy()
    tseg[: max(prompt_len - 1, 0)] = 0  # target at i predicts token i+1
    return {**row, "targets_segmentation": tseg}


def sft_example_to_row(
    prompt_ids: list[int], completion_ids: list[int], max_len: int
) -> dict:
    row = finalize_row([list(prompt_ids) + list(completion_ids)], max_len)
    return mask_prompt_targets(row, len(prompt_ids))


class SFTDataIterator:
    """Yields batches of prompt-masked rows."""

    def __init__(self, cfg: Config, source: Iterator[tuple[list[int], list[int]]] | None = None):
        self.cfg = cfg
        self.batch = cfg.global_batch_size_to_load
        self.max_len = cfg.max_target_length
        self.source = source or self._synthetic()

    def _synthetic(self):
        rng = np.random.default_rng(self.cfg.data_shuffle_seed)
        v = self.cfg.vocab_size
        while True:
            p = rng.integers(3, min(v, 64), size=int(rng.integers(4, 16))).tolist()
            c = rng.integers(3, min(v, 64), size=int(rng.integers(4, 32))).tolist()
            yield p, c

    def __iter__(self):
        return self

    def __next__(self):
        rows = [
            sft_example_to_row(*next(self.source), self.max_len)
            for _ in range(self.batch)
        ]
        return {k: np.stack([r[k] for r in rows]) for k in rows[0]}


def hf_sft_source(cfg: Config):
    """{'prompt','completion'} or chat-format HF dataset -> (ids, ids)."""
    from datasets import load_dataset

    tok = build_tokenizer(cfg)
    ds = load_dataset(cfg.dataset_path, split="train", streaming=True)
    for ex in ds:
        if "messages" in ex:  # chat format: all-but-last = prompt
            msgs = ex["messages"]
            prompt = "\n".join(m["content"] for m in msgs[:-1])
            completion = msgs[-1]["content"]
        else:
            prompt = ex.get("prompt", "")
            completion = ex.get("completion") or ex.get("response", "")
        yield tok.encode(prompt), tok.encode(completion)


def train_sft(cfg: Config):
    from maxtext_indextts2_tpu.train import train as train_lib

    source = hf_sft_source(cfg) if cfg.dataset_path else None
    it = SFTDataIterator(cfg, source)
    orig = train_lib.create_data_iterator
    train_lib.create_data_iterator = lambda c: it
    try:
        return train_lib.train_loop(cfg)
    finally:
        train_lib.create_data_iterator = orig


def main(argv=None):
    import sys

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    metrics = train_sft(cfg)
    print({k: float(v) for k, v in metrics.items()})


if __name__ == "__main__":
    main()


def vision_sft_example_to_row(
    cfg: Config,
    image,  # [H, W, 3] uint8/float
    prompt_ids: list[int],
    answer_ids: list[int],
    tokens_per_image: int,
    image_size: int = 224,
):
    """Vision-SFT row (reference: _hf_data_processing.py:145 vision-SFT
    variant): the prompt carries one image placeholder expanded to
    `tokens_per_image` slots of cfg.image_token_id; the loss is masked to
    the answer. Returns (row dict, pixels [tiles, S, S, 3]).

    Training composition: encode `pixels` with models/vision.VisionEncoder
    (+ family projector), then pass the result as `vision_embeddings` to
    Transformer.__call__ — the same fusion path the multimodal parity tests
    drive."""
    import numpy as np

    from maxtext_indextts2_tpu.utils.multimodal import (
        ImagePreprocessConfig,
        insert_image_tokens,
        preprocess_image,
    )

    s = cfg.max_target_length
    placeholder = -7  # internal marker, expanded below
    seq = list(prompt_ids) + [placeholder] + list(answer_ids)
    tokens, img_mask = insert_image_tokens(
        np.asarray(seq, np.int32), placeholder, tokens_per_image,
        cfg.image_token_id, s,
    )
    # answer starts after prompt + image tokens
    ans_start = min(len(prompt_ids) + tokens_per_image, s)
    ans_end = min(ans_start + len(answer_ids), s)
    targets = np.roll(tokens, -1)
    targets[-1] = 0
    weights = np.zeros((s,), np.float32)
    weights[max(ans_start - 1, 0): max(ans_end - 1, 0)] = 1.0  # predict answer tokens
    row = {
        "inputs": tokens,
        "inputs_position": np.arange(s, dtype=np.int32),
        "inputs_segmentation": (tokens != 0).astype(np.int32),
        "targets": targets,
        "targets_segmentation": (weights > 0).astype(np.int32),
        "image_mask": img_mask,
    }
    pixels = np.asarray(preprocess_image(
        image, ImagePreprocessConfig(image_size=image_size)
    ))
    return row, pixels
