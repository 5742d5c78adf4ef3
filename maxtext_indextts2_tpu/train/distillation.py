"""Distillation data generation: teacher completions -> SFT dataset.

Reference: MaxText/generate_distillation_data.py +
input_pipeline/_distillation_data_processing.py. Runs the offline engine
over a prompt set and writes {prompt, completion} JSONL that the SFT
pipeline consumes directly.

Run: ``python -m maxtext_indextts2_tpu.train.distillation <cfg> \
    distillation_out=/tmp/distill.jsonl ...``
"""

from __future__ import annotations

import json

import numpy as np

from maxtext_indextts2_tpu.config import Config, load_config
from maxtext_indextts2_tpu.infer.offline_engine import OfflineEngine
from maxtext_indextts2_tpu.train.data.tokenizer import build_tokenizer


def generate_distillation_data(
    cfg: Config,
    prompts: list[str] | list[np.ndarray],
    out_path: str,
    max_new_tokens: int = 64,
    engine=None,
) -> int:
    tok = build_tokenizer(cfg)
    if prompts and isinstance(prompts[0], str):
        prompt_ids = [np.asarray(tok.encode(p), np.int32) for p in prompts]
        texts = list(prompts)
    else:
        prompt_ids = [np.asarray(p, np.int32) for p in prompts]
        texts = [tok.decode(list(p)) for p in prompt_ids]

    off = OfflineEngine(cfg, engine=engine)
    completions = off.generate_batch(prompt_ids, max_new_tokens)
    n = 0
    with open(out_path, "w") as f:
        for text, pids, comp in zip(texts, prompt_ids, completions):
            f.write(json.dumps({
                "prompt": text,
                "prompt_ids": pids.tolist(),
                "completion_ids": comp,
                "completion": tok.decode(comp),
            }) + "\n")
            n += 1
    return n


def main(argv=None):
    import sys

    argv = list(sys.argv[1:] if argv is None else argv)
    out = "/tmp/distillation.jsonl"
    keep = []
    for a in argv:
        if a.startswith("distillation_out="):
            out = a.split("=", 1)[1]
        else:
            keep.append(a)
    cfg = load_config(keep)
    prompts = ["hello world", "the quick brown fox", "once upon a time"]
    n = generate_distillation_data(cfg, prompts, out)
    print(f"wrote {n} distillation examples to {out}")


if __name__ == "__main__":
    main()
