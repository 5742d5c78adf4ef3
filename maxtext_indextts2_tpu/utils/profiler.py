"""Profiling: xplane traces + step annotations.

Reference: MaxText/profiler.py:29 Profiler (xplane/nsys dispatch, periodic
re-profiling), jax.profiler.StepTraceAnnotation at step boundaries
(train.py:649).
"""

from __future__ import annotations

import contextlib
import os

import jax

from maxtext_indextts2_tpu.config import Config


class Profiler:
    def __init__(self, cfg: Config, output_dir: str | None = None):
        self.cfg = cfg
        self.enabled = cfg.enable_profiler
        self.output_dir = output_dir or os.path.join(
            cfg.base_output_directory, cfg.run_name, "profile"
        )
        self.start_step = cfg.skip_first_n_steps_for_profiler
        self.end_step = self.start_step + cfg.profiler_steps
        # re-profile every N steps after the first window (reference
        # profiler.py:111-115 profile_periodically_period); 0 = once
        self.period = getattr(cfg, "profile_periodically_period", 0)
        self._active = False
        self._window = 0

    def maybe_start(self, step: int):
        if self.enabled and not self._active and step == self.start_step:
            out = self.output_dir
            if self._window:
                out = os.path.join(out, f"period_{self._window}")
            os.makedirs(out, exist_ok=True)
            jax.profiler.start_trace(out)
            self._active = True

    def maybe_stop(self, step: int):
        if self._active and step >= self.end_step:
            jax.profiler.stop_trace()
            self._active = False
            self._maybe_upload()
            if self.period > 0:
                self._window += 1
                self.start_step += self.period
                self.end_step = self.start_step + self.cfg.profiler_steps

    def _maybe_upload(self) -> None:
        """Ship the trace dir to cfg.metrics_upload_dir (reference:
        profiler.py:99 gsutil upload for nsys traces). Best-effort."""
        dest = getattr(self.cfg, "metrics_upload_dir", "")
        if not dest or jax.process_index() != 0:
            return
        try:
            if dest.startswith("gs://"):
                import subprocess

                subprocess.run(
                    ["gsutil", "-q", "-m", "cp", "-r", self.output_dir, dest],
                    check=False, timeout=300,
                )
            else:
                import shutil

                shutil.copytree(
                    self.output_dir,
                    os.path.join(dest, os.path.basename(self.output_dir)),
                    dirs_exist_ok=True,
                )
        except Exception:  # noqa: BLE001
            pass

    def step_annotation(self, step: int):
        if self.enabled:
            return jax.profiler.StepTraceAnnotation("train", step_num=step)
        return contextlib.nullcontext()

    def close(self):
        if self._active:
            jax.profiler.stop_trace()
            self._active = False
