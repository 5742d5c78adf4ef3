"""Process-level disruption tests: SIGKILL a live trainer mid-step and a
live server mid-request, then assert recovery (reference:
benchmarks/disruption_management/ kills/suspends workloads and monitors
recovery; this repo previously injected failures only in-process).

The trainer test drives the real CLI (`python -m
maxtext_indextts2_tpu.train.train`) in a subprocess on a single virtual CPU
device, kills it with SIGKILL once steps are flowing, restarts it, and
asserts resume from the emergency checkpoint with at most
local_checkpoint_period steps of loss.
"""

import json
import os
import signal
import socket
import subprocess
import sys
import time

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _env(n_devices=1):
    env = dict(os.environ)
    env["MTT_PLATFORM"] = "cpu"
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "").replace(
            "--xla_force_host_platform_device_count=8", "") +
        f" --xla_force_host_platform_device_count={n_devices}"
    ).strip()
    return env


def _wait_for(predicate, timeout_s, what, poll=0.25):
    t0 = time.monotonic()
    while time.monotonic() - t0 < timeout_s:
        if predicate():
            return
        time.sleep(poll)
    raise AssertionError(f"timed out after {timeout_s}s waiting for {what}")


def _read_steps(metrics_file):
    if not os.path.exists(metrics_file):
        return []
    steps = []
    with open(metrics_file) as f:
        for line in f:
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if "loss" in rec:  # train steps only (skip eval/aux records)
                steps.append(int(rec["step"]))
    return steps


def test_trainer_sigkill_resumes_from_emergency_checkpoint(tmp_path):
    metrics_file = str(tmp_path / "metrics.jsonl")
    args = [
        sys.executable, "-m", "maxtext_indextts2_tpu.train.train",
        "base_emb_dim=32", "base_mlp_dim=64", "base_num_decoder_layers=2",
        "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=16",
        "vocab_size=128", "max_target_length=32", "per_device_batch_size=2",
        "dtype=float32", "steps=60", "dataset_type=synthetic",
        "enable_checkpointing=true", "enable_emergency_checkpoint=true",
        "checkpoint_period=16", "local_checkpoint_period=4",
        f"base_output_directory={tmp_path}", "run_name=disrupt",
        f"metrics_file={metrics_file}",
    ]
    p1 = subprocess.Popen(args, env=_env(), cwd=REPO,
                          stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    try:
        # let it get well past the first local save (steps 3, 7, ...)
        _wait_for(lambda: len(_read_steps(metrics_file)) >= 10, 600,
                  "10 training steps in run 1")
    finally:
        if p1.poll() is None:
            p1.send_signal(signal.SIGKILL)
        p1.wait(timeout=60)
    run1_steps = _read_steps(metrics_file)
    killed_at = max(run1_steps)
    assert killed_at < 59, "run 1 finished before the kill; test is vacuous"

    # the emergency local tier must exist on disk
    local_dir = tmp_path / "disrupt" / "checkpoints" / ".." / "local_emergency"
    assert os.path.isdir(os.path.normpath(str(local_dir))), (
        "no local emergency checkpoint directory after kill"
    )

    p2 = subprocess.run(args, env=_env(), cwd=REPO, capture_output=True,
                        text=True, timeout=900)
    assert p2.returncode == 0, f"restart failed:\n{p2.stdout}\n{p2.stderr}"
    steps = _read_steps(metrics_file)
    run2_steps = steps[len(run1_steps):]
    assert run2_steps, "run 2 recorded no steps"
    first2 = min(run2_steps)
    # resumed from a checkpoint: not from scratch, and at most
    # local_checkpoint_period steps behind the kill point
    assert first2 > 0, "run 2 restarted from step 0 (no restore happened)"
    # at most two local-save intervals behind: one for the interval itself
    # plus one because SIGKILL can land while the newest async save is
    # still uncommitted (only durable saves may be restored)
    assert killed_at - first2 <= 8, (
        f"lost more than two local-save intervals: killed at {killed_at}, "
        f"resumed at {first2}"
    )
    assert max(run2_steps) == 59, "run 2 did not train to completion"


SERVER_ARGS = [
    "vocab_size=9344", "audio_codebook_size=8192",
    "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
    "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
    "max_target_length=512", "max_prefill_predict_length=128",
    "per_device_batch_size=0.125", "dtype=float32", "decoder_block=tts",
    "s2a_num_quantizers=4", "s2a_hidden_size=64", "s2a_num_layers=2",
    "s2a_num_heads=4", "s2a_codebook_size=64", "s2a_timesteps=[2,2,2,2]",
    "semantic_codebook_size=8192",
    "tts_batch_max=1", "serving_admission_fusion_max=1",
    "serving_steps_per_dispatch=2", "tts_allow_force_frames=true",
]


def _start_uniserver(port):
    p = subprocess.Popen(
        [sys.executable, "-m", "maxtext_indextts2_tpu.infer.uniserver",
         f"port={port}"] + SERVER_ARGS,
        env=_env(8), cwd=REPO, stdout=subprocess.DEVNULL,
        stderr=subprocess.PIPE)
    os.set_blocking(p.stderr.fileno(), False)
    deadline = time.monotonic() + 900
    buf = b""
    while time.monotonic() < deadline:
        chunk = p.stderr.read()
        if chunk:
            buf += chunk
            if b"READY" in buf:
                return p
        if p.poll() is not None:
            raise AssertionError(
                f"uniserver exited before READY (rc={p.poll()}):\n"
                f"{buf.decode(errors='replace')[-2000:]}")
        time.sleep(0.2)
    p.send_signal(signal.SIGKILL)
    raise AssertionError("uniserver never printed READY")


def _tts_request(port, timeout=300):
    import base64
    import urllib.request

    import numpy as np

    w16 = np.zeros(8000, np.float32)
    w24 = np.zeros(12000, np.float32)
    body = json.dumps({
        "text": "disruption test",
        "prompt_wav_16k_b64": base64.b64encode(w16.tobytes()).decode(),
        "prompt_wav_24k_b64": base64.b64encode(w24.tobytes()).decode(),
        "max_new_tokens": 6, "force_frames": True,
    }).encode()
    req = urllib.request.Request(
        f"http://127.0.0.1:{port}/tts", data=body,
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return r.status, json.loads(r.read())


@pytest.mark.slow
def test_server_sigkill_client_observes_error_then_restart_serves():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    p = _start_uniserver(port)
    try:
        status, out = _tts_request(port)
        assert status == 200 and "wav_b64" in out
        # in-flight request, then SIGKILL mid-service
        import threading
        import urllib.error

        errs = []

        def inflight():
            try:
                _tts_request(port, timeout=60)
                errs.append("completed")  # acceptable if it raced the kill
            except Exception as e:  # noqa: BLE001 — the expected outcome
                errs.append(type(e).__name__)

        t = threading.Thread(target=inflight)
        t.start()
        time.sleep(0.3)
        p.send_signal(signal.SIGKILL)
        p.wait(timeout=60)
        t.join(timeout=90)
        assert errs, "in-flight client neither errored nor completed"
    finally:
        if p.poll() is None:
            p.send_signal(signal.SIGKILL)
            p.wait(timeout=60)

    # restart: the port is free again and a fresh process serves
    p2 = _start_uniserver(port)
    try:
        status, out = _tts_request(port)
        assert status == 200 and "wav_b64" in out
    finally:
        p2.send_signal(signal.SIGKILL)
        p2.wait(timeout=60)
