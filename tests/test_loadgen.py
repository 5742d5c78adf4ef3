"""MLPerf-style loadgen protocol (infer/loadgen.py).

Reference capability: MaxText/inference_mlperf/offline_mode.py:541 drives
serving benchmarks through mlperf_loadgen's QSL/SUT protocol with Offline
and Server scenarios; that package is absent here so the protocol is
implemented in-repo and tested with both a fake SUT (scenario/validity
semantics) and the real tiny engine (integration through the actual
serving paths)."""

import threading
import time

import numpy as np
import pytest

from maxtext_indextts2_tpu.infer.loadgen import (
    OFFLINE,
    SERVER,
    QuerySampleLibrary,
    TestSettings,
    run_test,
)


class InstantSUT:
    def __init__(self, latency_s=0.0, fail_ids=()):
        self.lat = latency_s
        self.fail_ids = set(fail_ids)
        self.issued = []

    def issue_query(self, ctx, samples):
        self.issued.extend(samples)

        def done():
            if self.lat:
                time.sleep(self.lat)
            for s in samples:
                ctx.query_complete(
                    s.id, None if s.id in self.fail_ids else [1, 2, 3])

        threading.Thread(target=done, daemon=True).start()


def test_offline_scenario_counts_throughput():
    qsl = QuerySampleLibrary([np.array([1, 2])] * 4)
    res = run_test(InstantSUT(), qsl,
                   TestSettings(scenario=OFFLINE, min_query_count=8))
    assert res.valid and res.issued == 8 and res.completed == 8
    assert res.completed_qps > 0
    assert "VALID" in res.summary()


def test_server_scenario_poisson_and_slo_pass():
    qsl = QuerySampleLibrary([np.array([1])])
    res = run_test(
        InstantSUT(latency_s=0.01), qsl,
        TestSettings(scenario=SERVER, target_qps=50.0, min_duration_s=0.3,
                     min_query_count=10, server_target_latency_s=1.0))
    assert res.valid, res.reasons
    assert res.completed == res.issued >= 10
    assert res.percentiles["p99"] < 1.0


def test_server_scenario_slo_violation_is_invalid():
    qsl = QuerySampleLibrary([np.array([1])])
    res = run_test(
        InstantSUT(latency_s=0.2), qsl,
        TestSettings(scenario=SERVER, target_qps=20.0, min_duration_s=0.2,
                     min_query_count=5, server_target_latency_s=0.05))
    assert not res.valid
    assert any("exceeds target" in r for r in res.reasons)
    assert "INVALID" in res.summary()


def test_errored_samples_invalidate():
    qsl = QuerySampleLibrary([np.array([1])] * 2)
    res = run_test(InstantSUT(fail_ids={0}), qsl,
                   TestSettings(scenario=OFFLINE, min_query_count=4))
    assert not res.valid
    assert any("errors" in r for r in res.reasons)


@pytest.mark.parametrize("scenario", [OFFLINE, SERVER])
def test_loadgen_end_to_end_tiny_engine(scenario):
    """Integration: the loadgen protocol drives the REAL serving paths —
    OfflineEngine (offline) and the continuous-batching Orchestrator
    (server) — and both produce a VALID run with identical greedy tokens."""
    import benchmarks.mlperf_offline as mo

    out = mo.run([f"scenario={scenario}", "num_queries=6", "max_new=4",
                  "target_qps=4", "latency_bound=60"])
    assert out["detail"]["valid"], out["detail"]
    assert out["detail"]["completed"] == out["detail"]["issued"]
    assert out["value"] > 0
