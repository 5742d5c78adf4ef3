"""GCP workload observability: heartbeat/performance reporters + Vertex TB.

Reference capabilities: MaxText/gcp_workload_monitor.py:40 (GCPWorkloadMonitor
posting workload_process/heartbeat and workload/performance time series to
Cloud Monitoring) and MaxText/vertex_tensorboard.py:30
(VertexTensorboardManager creating a Vertex AI Tensorboard instance and
streaming the local TB logdir to it).

Design differences from the reference:

- **Env-gated, zero hard deps.** The reference imports
  ``google.cloud.monitoring_v3`` / ``cloud_accelerator_diagnostics`` at module
  import, which makes every entry point require cloud packages. Here the
  client libraries are imported lazily inside ``start()`` and only when the
  config flag is on; local/dev runs never touch them.
- **One reporter class.** Heartbeat and performance reporting share a
  termination event and a client; the performance feed is a plain callable
  (``report_performance(value)``) instead of a queue the train loop must own.
- Metadata (project/zone/instance) comes from the GCE metadata server with
  short timeouts and explicit fallbacks, so the reporter degrades to a no-op
  off-GCP instead of crashing the job.
"""

from __future__ import annotations

import logging
import os
import threading
import time

logger = logging.getLogger(__name__)

_METADATA_URL = "http://metadata.google.internal/computeMetadata/v1/"


def _gcp_metadata(path: str, timeout: float = 2.0) -> str | None:
    """Fetch one GCE metadata value; None when off-GCP / unreachable."""
    import urllib.request

    req = urllib.request.Request(
        _METADATA_URL + path, headers={"Metadata-Flavor": "Google"}
    )
    try:
        with urllib.request.urlopen(req, timeout=timeout) as resp:
            return resp.read().decode()
    except Exception:  # noqa: BLE001 — any failure means "not on GCP"
        return None


class GCPWorkloadMonitor:
    """Background heartbeat + performance reporting to Cloud Monitoring.

    Usage (wired in train.py when the flags are on)::

        mon = GCPWorkloadMonitor(cfg)
        mon.start_heartbeat()                    # thread, every N seconds
        mon.report_performance(tflops_per_s)     # from the metric logger
        ...
        mon.stop()
    """

    def __init__(self, cfg, client=None):
        self.run_name = getattr(cfg, "run_name", "") or "mtt-unnamed"
        self.interval = int(
            getattr(cfg, "heartbeat_reporting_interval_in_seconds", 5)
        )
        self.workload_id = f"{self.run_name}-{int(time.time())}"
        self._client = client  # injectable for tests
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self._project: str | None = None
        self._zone: str | None = None
        self._instance: str | None = None

    # -------------------------------------------------------------- plumbing
    def _ensure_client(self):
        if self._client is None:
            # lazy: only Pathways/GKE deployments carry the client library
            from google.cloud import monitoring_v3  # noqa: PLC0415

            self._client = monitoring_v3.MetricServiceClient()
        if self._project is None:
            self._project = _gcp_metadata("project/project-id") or "unknown"
            zone = _gcp_metadata("instance/zone") or "unknown"
            self._zone = zone.rsplit("/", 1)[-1]
            self._instance = _gcp_metadata("instance/id") or "unknown"
        return self._client

    def _time_series(self, metric_type: str, resource_type: str,
                     value: dict, metric_labels: dict, resource_labels: dict):
        """Build the create_time_series request body as plain dicts — the
        monitoring_v3 protos accept dict initialization, which keeps this
        module importable (and testable) without the protobuf classes."""
        now = time.time()
        seconds = int(now)
        return {
            "metric": {"type": metric_type, "labels": metric_labels},
            "resource": {"type": resource_type, "labels": resource_labels},
            "points": [{
                "interval": {"end_time": {
                    "seconds": seconds,
                    "nanos": int((now - seconds) * 1e9),
                }},
                "value": value,
            }],
        }

    def _send(self, series: dict):
        client = self._ensure_client()
        client.create_time_series(
            request={
                "name": f"projects/{self._project}",
                "time_series": [series],
            },
            timeout=30,
        )

    # -------------------------------------------------------------- reporting
    def report_heartbeat(self):
        """One heartbeat point (workload_process/heartbeat, bool)."""
        self._ensure_client()
        rank = os.environ.get("JAX_PROCESS_INDEX", "0")
        self._send(self._time_series(
            "compute.googleapis.com/workload_process/heartbeat",
            "compute.googleapis.com/WorkloadProcess",
            {"bool_value": True},
            {"local_rank": "0", "instance_id": self._instance},
            {
                "project_id": self._project,
                "location": self._zone,
                "workload_id": self.workload_id,
                "replica_id": "0",
                "process_id": rank,
            },
        ))

    def report_performance(self, value: float):
        """One performance point (workload/performance, double) — e.g. the
        step's TFLOP/s, fed by MetricLogger.write_step."""
        self._ensure_client()
        self._send(self._time_series(
            "compute.googleapis.com/workload/performance",
            "compute.googleapis.com/Workload",
            {"double_value": float(value)},
            {},
            {
                "location": self._zone,
                "workload_id": self.workload_id,
                "replica_id": "0",
            },
        ))

    def start_heartbeat(self):
        """Start the daemon heartbeat thread (idempotent)."""
        if self._thread is not None:
            return
        # surface missing-client errors on the caller's thread, not in the
        # daemon where they would be swallowed
        self._ensure_client()

        def loop():
            while not self._stop.is_set():
                try:
                    self.report_heartbeat()
                except Exception as e:  # noqa: BLE001 — monitoring must
                    # never kill the job it monitors
                    logger.warning("heartbeat report failed: %s", e)
                self._stop.wait(self.interval)

        self._thread = threading.Thread(target=loop, daemon=True)
        self._thread.start()

    def stop(self):
        self._stop.set()
        if self._thread is not None:
            self._thread.join(timeout=self.interval + 1)
            self._thread = None


class VertexTensorboardManager:
    """Create a Vertex AI Tensorboard experiment and stream a logdir to it.

    Reference: vertex_tensorboard.py:30 (cloud_accelerator_diagnostics
    tensorboard.create_instance/create_experiment + uploader). Same flow,
    lazily imported and driven by config keys instead of raw env vars (env
    vars still win for parity: TENSORBOARD_PROJECT/REGION/NAME).
    """

    def __init__(self, cfg, diagnostics=None):
        self.project = os.environ.get("TENSORBOARD_PROJECT") or getattr(
            cfg, "vertex_tensorboard_project", ""
        )
        self.region = os.environ.get("TENSORBOARD_REGION") or getattr(
            cfg, "vertex_tensorboard_region", ""
        )
        self.name = os.environ.get(
            "TENSORBOARD_NAME", f"{self.project}-tensorboard"
        )
        self.experiment = os.environ.get(
            "EXPERIMENT_NAME", getattr(cfg, "run_name", "") or "mtt-run"
        )
        self._diag = diagnostics  # injectable for tests
        self._uploading = False

    def _modules(self):
        if self._diag is None:
            # lazy: only cloud deployments carry the package
            from cloud_accelerator_diagnostics import (  # noqa: PLC0415
                tensorboard,
                uploader,
            )

            self._diag = (tensorboard, uploader)
        return self._diag

    def setup(self) -> str | None:
        """Create instance + experiment; returns the Vertex TB URL or None."""
        if not self.project or not self.region:
            logger.info(
                "vertex tensorboard not configured "
                "(vertex_tensorboard_project/region unset)"
            )
            return None
        tensorboard, _ = self._modules()
        instance_id = tensorboard.create_instance(
            project=self.project, location=self.region,
            tensorboard_name=self.name,
        )
        if instance_id is None:
            logger.warning("failed to create Vertex Tensorboard instance")
            return None
        _, url = tensorboard.create_experiment(
            project=self.project, location=self.region,
            experiment_name=self.experiment, tensorboard_name=self.name,
        )
        return url

    def upload_data(self, tensorboard_dir: str):
        """Start the continuous uploader for ``tensorboard_dir``."""
        _, uploader = self._modules()
        uploader.start_upload_to_tensorboard(
            project=self.project, location=self.region,
            tensorboard_name=self.name, experiment_name=self.experiment,
            logdir=tensorboard_dir,
        )
        self._uploading = True

    def stop(self):
        if self._uploading:
            _, uploader = self._modules()
            uploader.stop_upload_to_tensorboard()
            self._uploading = False


def maybe_start_monitoring(cfg, logdir: str | None = None):
    """Entry-point hook: start whichever reporters the config enables.

    Returns (monitor, vertex_manager) — either may be None. Called from
    train.py main; a no-op (None, None) in default configs.
    """
    monitor = None
    if getattr(cfg, "report_heartbeat_metric_for_gcp_monitoring", False):
        monitor = GCPWorkloadMonitor(cfg)
        monitor.start_heartbeat()
    vertex = None
    if getattr(cfg, "use_vertex_tensorboard", False):
        vertex = VertexTensorboardManager(cfg)
        vertex.setup()
        if logdir:
            vertex.upload_data(logdir)
    return monitor, vertex
