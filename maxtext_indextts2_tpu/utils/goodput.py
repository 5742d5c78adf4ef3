"""Goodput accounting: phase/event recorder + derived goodput fraction.

Reference: MaxText/utils/goodput_utils.py:29-97 (job/step/TPU-init event
recording wrapped around every train phase) + gcp_workload_monitor.py
heartbeats. Here: a dependency-free local recorder writing jsonl events; the
goodput fraction = productive step time / total wall time.
"""

from __future__ import annotations

import json
import os
import threading
import time
from contextlib import contextmanager

from maxtext_indextts2_tpu.config import Config


class GoodputRecorder:
    def __init__(self, cfg: Config, path: str | None = None):
        self.enabled = cfg.enable_goodput_recording
        self.path = path or os.path.join(
            cfg.base_output_directory, cfg.run_name, "goodput.jsonl"
        )
        self._f = None
        self._t0 = time.time()
        self._productive = 0.0
        if self.enabled:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            self._f = open(self.path, "a")

    def _write(self, event: str, **kv):
        if self._f:
            self._f.write(json.dumps({"event": event, "ts": time.time(), **kv}) + "\n")
            self._f.flush()

    @contextmanager
    def phase(self, name: str, productive: bool = False):
        t0 = time.time()
        self._write(f"{name}_start")
        try:
            yield
        finally:
            dt = time.time() - t0
            if productive:
                self._productive += dt
            self._write(f"{name}_end", seconds=dt)

    def record_step(self, step: int, step_time: float):
        self._productive += step_time
        self._write("step", step=step, seconds=step_time)

    def goodput_fraction(self) -> float:
        total = time.time() - self._t0
        return min(self._productive / max(total, 1e-9), 1.0)

    def close(self):
        if self._f:
            self._write("job_end", goodput=self.goodput_fraction())
            self._f.close()


class HeartbeatMonitor:
    """Background liveness heartbeat (reference: gcp_workload_monitor.py:40)."""

    def __init__(self, cfg: Config, interval_s: float = 60.0, path: str | None = None):
        self.enabled = cfg.monitor_goodput
        self.interval = interval_s
        self.path = path or os.path.join(
            cfg.base_output_directory, cfg.run_name, "heartbeat"
        )
        self._stop = threading.Event()
        self._thread = None
        if self.enabled:
            os.makedirs(os.path.dirname(self.path), exist_ok=True)
            self._thread = threading.Thread(target=self._run, daemon=True)
            self._thread.start()

    def _run(self):
        while not self._stop.wait(self.interval):
            with open(self.path, "w") as f:
                f.write(str(time.time()))

    def close(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=1)
