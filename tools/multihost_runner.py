#!/usr/bin/env python3
"""Multi-host TPU-VM launcher: sync the repo to every worker and run a command.

Reference: root multihost_runner.py (scp + gcloud ssh across TPU-VM workers)
and multihost_job.py (queued-resource creation + self-deleting jobs). This
generic version works with any ssh-reachable host list; pass
``--use_gcloud --tpu <name> --zone <z> --project <p>`` to route through
``gcloud compute tpus tpu-vm ssh/scp`` instead.

Example:
    python tools/multihost_runner.py --hosts host1,host2 \
        --command "python -m maxtext_indextts2_tpu.train.train cfg.yml steps=100"
"""

from __future__ import annotations

import argparse
import os
import shlex
import subprocess
import sys
import tempfile
import threading


def _ssh_cmd(args, host: str, remote_cmd: str) -> list[str]:
    if args.use_gcloud:
        return [
            "gcloud", "compute", "tpus", "tpu-vm", "ssh", args.tpu,
            f"--zone={args.zone}", f"--project={args.project}",
            f"--worker={host}", "--command", remote_cmd,
        ]
    return ["ssh", "-o", "StrictHostKeyChecking=no", host, remote_cmd]


def _scp_cmd(args, host: str, tarball: str, dest: str) -> list[str]:
    if args.use_gcloud:
        return [
            "gcloud", "compute", "tpus", "tpu-vm", "scp", tarball,
            f"{args.tpu}:{dest}", f"--zone={args.zone}",
            f"--project={args.project}", f"--worker={host}",
        ]
    return ["scp", "-o", "StrictHostKeyChecking=no", tarball, f"{host}:{dest}"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", required=True,
                    help="comma-separated hostnames, or worker indices with --use_gcloud")
    ap.add_argument("--command", required=True)
    ap.add_argument("--repo_dir", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap.add_argument("--remote_dir", default="~/mtt_run")
    ap.add_argument("--use_gcloud", action="store_true")
    ap.add_argument("--tpu", default="")
    ap.add_argument("--zone", default="")
    ap.add_argument("--project", default="")
    ap.add_argument("--env", action="append", default=[],
                    help="KEY=VALUE exported on every worker (repeatable)")
    args = ap.parse_args()
    hosts = args.hosts.split(",")

    # pack the repo once (tracked files only when git is available)
    with tempfile.TemporaryDirectory() as td:
        tarball = os.path.join(td, "code.tar.gz")
        try:
            files = subprocess.run(
                ["git", "-C", args.repo_dir, "ls-files"],
                capture_output=True, text=True, check=True,
            ).stdout.splitlines()
            subprocess.run(
                ["tar", "czf", tarball, "-C", args.repo_dir] + files, check=True
            )
        except subprocess.CalledProcessError:
            subprocess.run(
                ["tar", "czf", tarball, "-C", args.repo_dir, "."], check=True
            )

        env_exports = " ".join(f"export {shlex.quote(e)};" for e in args.env)
        remote = (
            f"mkdir -p {args.remote_dir} && cd {args.remote_dir} && "
            f"tar xzf /tmp/mtt_code.tar.gz && {env_exports} "
            f"PYTHONPATH={args.remote_dir} {args.command}"
        )

        rc = [0] * len(hosts)

        def run_host(i, host):
            scp = _scp_cmd(args, host, tarball, "/tmp/mtt_code.tar.gz")
            p = subprocess.run(scp)
            if p.returncode:
                rc[i] = p.returncode
                return
            p = subprocess.run(_ssh_cmd(args, host, remote))
            rc[i] = p.returncode

        threads = [
            threading.Thread(target=run_host, args=(i, h)) for i, h in enumerate(hosts)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    if any(rc):
        print(f"FAILED on workers: {[h for h, r in zip(hosts, rc) if r]}", file=sys.stderr)
        sys.exit(1)
    print("all workers finished OK")


if __name__ == "__main__":
    main()
