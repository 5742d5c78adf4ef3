"""Queued-resource TPU job launcher: create, run, log, self-delete.

Reference: root multihost_job.py (docstring 20-40) — creates a
queued-resource TPU slice, ships the code dir, runs the command on every
worker under nohup with logs to GCS, and deletes the QR when the job exits.
This build keeps the same lifecycle but emits/executes plain `gcloud`
commands so it stays testable without GCP access (``--dry_run`` prints the
exact command sequence).

Usage:
  python tools/multihost_job.py --tpu_type=v5e-256 --project=p --zone=z \
      --run_name=my-run --gcs_path=gs://bucket/logs \
      --command="python -m maxtext_indextts2_tpu.train.train ..." [--dry_run]
"""

from __future__ import annotations

import argparse
import shlex
import subprocess
import sys
import time


def _qr_create_cmd(a) -> list[str]:
    return [
        "gcloud", "alpha", "compute", "tpus", "queued-resources", "create",
        a.run_name,
        f"--node-id={a.run_name}-0",
        f"--project={a.project}",
        f"--zone={a.zone}",
        f"--accelerator-type={a.tpu_type}",
        f"--runtime-version={a.runtime_version}",
        "--best-effort" if a.best_effort else "--reserved",
    ]


def _startup_script(a) -> str:
    # Per-worker: pull code from GCS, run the command, stream logs back,
    # and (worker 0) delete the QR when done — the self-delete that keeps
    # preemptible sweeps from leaking TPUs.
    log = f"{a.gcs_path}/{a.run_name}/worker-$(hostname).log"
    return "\n".join([
        "#!/bin/bash",
        "set -x",
        f"gsutil -m cp -r {a.gcs_path}/{a.run_name}/code /tmp/job",
        "cd /tmp/job",
        f"({a.command}) 2>&1 | tee /tmp/job.log",
        f"gsutil cp /tmp/job.log {log}",
        "if [[ $(hostname) == *-0 ]]; then "
        f"gcloud alpha compute tpus queued-resources delete {a.run_name} "
        f"--project={a.project} --zone={a.zone} --force --quiet; fi",
    ])


def _ship_code_cmd(a) -> list[str]:
    return [
        "gsutil", "-m", "cp", "-r", ".",
        f"{a.gcs_path}/{a.run_name}/code",
    ]


def _run_cmd(a) -> list[str]:
    script = _startup_script(a)
    return [
        "gcloud", "compute", "tpus", "tpu-vm", "ssh", f"{a.run_name}-0",
        f"--project={a.project}", f"--zone={a.zone}", "--worker=all",
        f"--command=nohup bash -c {shlex.quote(script)} >/dev/null 2>&1 &",
    ]


def build_commands(a) -> list[list[str]]:
    return [_ship_code_cmd(a), _qr_create_cmd(a), _run_cmd(a)]


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--tpu_type", required=True)
    p.add_argument("--project", required=True)
    p.add_argument("--zone", required=True)
    p.add_argument("--run_name", required=True)
    p.add_argument("--gcs_path", required=True)
    p.add_argument("--command", required=True)
    p.add_argument("--runtime-version", default="v2-alpha-tpuv5-lite")
    p.add_argument("--best_effort", action="store_true")
    p.add_argument("--dry_run", action="store_true")
    a = p.parse_args(argv)

    cmds = build_commands(a)
    for cmd in cmds:
        print("+", " ".join(shlex.quote(c) for c in cmd))
        if not a.dry_run:
            rc = subprocess.run(cmd).returncode
            if rc != 0:
                print(f"command failed with {rc}", file=sys.stderr)
                return rc
            time.sleep(1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
