"""Metric logging: stdout + jsonl (+ optional TensorBoard).

Reference: MaxText/metric_logger.py:47 MetricLogger (buffered TB/jsonl/GCS
writes, per-step perf scalars).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import jax
import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.utils import flops as flops_lib


def _chip_kind() -> str:
    d = jax.devices()[0]
    kind = getattr(d, "device_kind", "").lower()
    for key in ("v5 lite", "v5e"):
        if key in kind:
            return "v5e"
    for key in ("v5p", "v4", "v6e"):
        if key in kind:
            return key
    return "cpu" if d.platform == "cpu" else "v5e"


class MetricLogger:
    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.chip = _chip_kind()
        self.num_chips = cfg.num_devices
        self._jsonl = None
        if cfg.metrics_file:
            os.makedirs(os.path.dirname(cfg.metrics_file) or ".", exist_ok=True)
            self._jsonl = open(cfg.metrics_file, "a")
        self._tb = None
        if cfg.enable_tensorboard:
            try:
                from flax.metrics import tensorboard

                tb_dir = os.path.join(cfg.base_output_directory, cfg.run_name, "tb")
                self._tb = tensorboard.SummaryWriter(tb_dir)
            except ImportError:
                pass

    def write_step(
        self,
        step: int,
        metrics: dict[str, Any],
        step_time: float,
        tflops_per_step: float = 0.0,
        tokens_per_step: int = 0,
    ) -> None:
        scalars = {k: float(np.asarray(v)) for k, v in metrics.items()}
        scalars["step_time_s"] = step_time
        if tflops_per_step:
            scalars["per_device_tflops_per_s"] = (
                tflops_per_step / step_time / self.num_chips
            )
            scalars["mfu"] = flops_lib.mfu(
                tflops_per_step, step_time, self.num_chips, self.chip
            )
        if tokens_per_step:
            scalars["tokens_per_s"] = tokens_per_step / step_time
        line = ", ".join(
            f"{k}: {v:.4g}" for k, v in scalars.items() if k in
            ("loss", "grad_norm", "step_time_s", "per_device_tflops_per_s", "tokens_per_s", "mfu")
        )
        print(f"step {step}: {line}", flush=True)
        if self._jsonl:
            self._jsonl.write(json.dumps({"step": step, "ts": time.time(), **scalars}) + "\n")
            self._jsonl.flush()
            if step % 100 == 0:
                self._maybe_upload()
        if self._tb and jax.process_index() == 0:
            for k, v in scalars.items():
                self._tb.scalar(k, v, step)

    def _maybe_upload(self) -> None:
        """Mirror the jsonl to cfg.metrics_upload_dir (gs:// via gsutil like
        the reference's profiler upload, plain copy otherwise). Best-effort:
        metric delivery must never take down a training job."""
        dest = getattr(self.cfg, "metrics_upload_dir", "")
        src = self.cfg.metrics_file
        if not dest or not src or jax.process_index() != 0:
            return
        try:
            if dest.startswith("gs://"):
                import subprocess

                subprocess.run(
                    ["gsutil", "-q", "cp", src, dest.rstrip("/") + "/"],
                    check=False, timeout=60,
                )
            else:
                import shutil

                os.makedirs(dest, exist_ok=True)
                shutil.copy2(src, dest)
        except Exception:  # noqa: BLE001
            pass

    def close(self):
        if self._jsonl:
            self._jsonl.close()
            self._maybe_upload()
        if self._tb:
            self._tb.flush()
