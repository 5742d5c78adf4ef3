"""Synthetic + placeholder data iterators (reference:
MaxText/input_pipeline/synthetic_data_processing.py). Device-side generated
batches decouple runtime tests/benches from any dataset."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from maxtext_indextts2_tpu.config import Config


def make_batch(cfg: Config, step: int, batch_size: int | None = None) -> dict:
    """Deterministic synthetic LM batch: random tokens, causal targets."""
    b = batch_size or cfg.global_batch_size_to_load
    s = cfg.max_target_length
    rng = np.random.default_rng(cfg.data_shuffle_seed + step)
    tokens = rng.integers(1, cfg.vocab_size, size=(b, s), dtype=np.int32)
    return {
        "inputs": tokens,
        "inputs_position": np.broadcast_to(np.arange(s, dtype=np.int32), (b, s)),
        "inputs_segmentation": np.ones((b, s), dtype=np.int32),
        "targets": np.roll(tokens, -1, axis=1),
        "targets_segmentation": np.ones((b, s), dtype=np.int32),
    }


class SyntheticDataIterator:
    """Yields the same jnp batch forever (cheap; matches reference behavior)."""

    def __init__(self, cfg: Config, batch_size: int | None = None):
        self.cfg = cfg
        self._step = 0
        self._batch = {k: jnp.asarray(v) for k, v in make_batch(cfg, 0, batch_size).items()}

    def __iter__(self):
        return self

    def __next__(self) -> dict:
        self._step += 1
        return self._batch
