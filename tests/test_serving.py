"""Serving tests: orchestrator continuous batching, offline engine,
HTTP server end-to-end (reference: jetstream orchestration + offline_engine)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from maxtext_indextts2_tpu.config import load_config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.infer.offline_engine import OfflineEngine
from maxtext_indextts2_tpu.infer.server import Orchestrator

CFG = [
    "base_emb_dim=64", "base_mlp_dim=128", "base_num_decoder_layers=2",
    "base_num_query_heads=2", "base_num_kv_heads=2", "head_dim=32",
    "vocab_size=256", "max_target_length=64", "max_prefill_predict_length=16",
    "per_device_batch_size=0.25", "dtype=float32", "decode_sampling_strategy=greedy",
]


@pytest.fixture(scope="module")
def engine():
    eng = Engine(load_config(CFG))
    eng.load_params()
    return eng


def test_offline_engine_matches_single_stream(engine):
    off = OfflineEngine(engine.cfg, engine=engine)
    prompts = [np.array([3, 5, 7], np.int32), np.array([11, 13], np.int32),
               np.array([2, 4, 6, 8], np.int32)]
    outs = off.generate_batch(prompts, max_new_tokens=6)
    assert len(outs) == 3
    for p, o in zip(prompts, outs):
        solo = engine.generate_stream(p, 6)
        assert o == solo


def test_orchestrator_concurrent_requests(engine):
    orch = Orchestrator(engine)
    orch.start()
    try:
        reqs = [
            orch.submit(np.array([3, 5, 7], np.int32), 5),
            orch.submit(np.array([11, 13], np.int32), 5),
            orch.submit(np.array([2, 4, 6, 8], np.int32), 5),
        ]
        for r in reqs:
            assert r.done.wait(timeout=120), "request timed out"
            assert r.error is None
            assert len(r.tokens) == 5
        # greedy decode must match direct single-stream decode
        solo = engine.generate_stream(np.array([3, 5, 7], np.int32), 5)
        assert reqs[0].tokens == solo
    finally:
        orch.stop()


def test_orchestrator_fused_admission_groups(engine):
    """Interleaved admission packs waiting requests into ONE
    prefill_insert_many dispatch (group sizes power-of-two, bounded by free
    slots) and the decoded streams still match solo decode exactly."""
    group_sizes = []
    orig = engine.prefill_insert_many

    def recording(state, prompts, slots):
        group_sizes.append(len(prompts))
        return orig(state, prompts, slots)

    engine.prefill_insert_many = recording
    orch = Orchestrator(engine)
    orch.start()
    try:
        prompts = [np.array([3, 5, 7], np.int32), np.array([11, 13], np.int32),
                   np.array([2, 4, 6, 8], np.int32)]
        reqs = [orch.submit(p, 5) for p in prompts]
        for r in reqs:
            assert r.done.wait(timeout=120), "request timed out"
            assert r.error is None
        for p, r in zip(prompts, reqs):
            assert r.tokens == engine.generate_stream(p, 5)
        # 2 slots, 3 requests submitted together: at least one fused group
        assert max(group_sizes) == 2, group_sizes
        assert all(k in (1, 2) for k in group_sizes), group_sizes
    finally:
        orch.stop()
        engine.prefill_insert_many = orig


def test_orchestrator_prefill_retry(engine):
    """Transient prefill dispatch failures (observed: sporadic 'TPU backend
    error (Internal)' from the axon relay under load) retry instead of
    failing the request; persistent failures surface after the bounded
    attempts."""
    from maxtext_indextts2_tpu.infer.server import Orchestrator

    calls = {"n": 0}
    orig = engine.prefill_insert_many

    def flaky(state, prompts, slots):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("TPU backend error (Internal)")
        return orig(state, prompts, slots)

    engine.prefill_insert_many = flaky
    orch = Orchestrator(engine)
    orch.start()
    try:
        r = orch.submit(np.array([3, 5, 7], np.int32), 5)
        assert r.done.wait(timeout=120)
        assert r.error is None
        assert len(r.tokens) == 5
        assert calls["n"] == 3  # two transient failures + the success
        assert r.tokens == engine.generate_stream(np.array([3, 5, 7], np.int32), 5)
    finally:
        orch.stop()
        engine.prefill_insert_many = orig

    def always_fails(state, prompts, slots):
        raise RuntimeError("permanently broken")

    engine.prefill_insert_many = always_fails
    orch = Orchestrator(engine)
    orch.start()
    try:
        r = orch.submit(np.array([3, 5, 7], np.int32), 5)
        assert r.done.wait(timeout=120)
        assert r.error is not None and "permanently broken" in r.error
    finally:
        orch.stop()
        engine.prefill_insert_many = orig


def test_orchestrator_mixed_depth_dispatch(engine):
    """Fused dispatch stays deep while streams finish mid-dispatch: slots
    free exactly at their remaining count (host-side emission clamping),
    depths are powers of two <= spd, and mixed-length requests complete
    exactly — the tail-starvation bug behind the 366/486 spd=16 load-sweep
    row (PERF.md) forced single-step mode instead."""
    from maxtext_indextts2_tpu.infer.server import Orchestrator

    depths: list[int] = []
    orig_generate, orig_generate_n = engine.generate, engine.generate_n

    def rec_generate(state):
        depths.append(1)
        return orig_generate(state)

    def rec_generate_n(state, n):
        depths.append(n)
        return orig_generate_n(state, n)

    engine.generate, engine.generate_n = rec_generate, rec_generate_n
    orch = Orchestrator(engine, steps_per_dispatch=8)
    orch.start()
    try:
        # different lengths: the short request's tail must not force the
        # long one into single-step dispatches
        r_short = orch.submit(np.array([3, 5, 7], np.int32), 5)
        r_long = orch.submit(np.array([11, 13], np.int32), 17)
        for r, want in ((r_short, 5), (r_long, 17)):
            assert r.done.wait(timeout=120)
            assert r.error is None
            assert len(r.tokens) == want
        # greedy parity with direct single-stream decode
        assert r_long.tokens == engine.generate_stream(
            np.array([11, 13], np.int32), 17)
        # fused dispatches happened (not all single-step), and every depth
        # is a power of two bounded by steps_per_dispatch
        assert max(depths) > 1
        assert all(d & (d - 1) == 0 and d <= 8 for d in depths)
    finally:
        orch.stop()
        engine.generate, engine.generate_n = orig_generate, orig_generate_n


def test_orchestrator_decode_failure_resumes_streams(engine):
    """A failed decode dispatch (transient relay error) must NOT kill the
    in-flight streams: the orchestrator rebuilds the decode state and
    resumes every active stream by re-prefilling prompt + tokens-so-far.
    Greedy output must be EXACTLY what an uninterrupted decode produces."""
    from maxtext_indextts2_tpu.infer.server import Orchestrator

    state = {"dispatches": 0, "failed": False}
    orig_generate, orig_generate_n = engine.generate, engine.generate_n

    def maybe_fail():
        state["dispatches"] += 1
        if state["dispatches"] == 3 and not state["failed"]:
            state["failed"] = True
            raise RuntimeError("TPU backend error (Internal)")

    def gen(s):
        maybe_fail()
        return orig_generate(s)

    def gen_n(s, n):
        maybe_fail()
        return orig_generate_n(s, n)

    engine.generate, engine.generate_n = gen, gen_n
    orch = Orchestrator(engine, steps_per_dispatch=2)
    orch.start()
    try:
        reqs = [
            orch.submit(np.array([3, 5, 7], np.int32), 12),
            orch.submit(np.array([11, 13], np.int32), 12),
        ]
        for r in reqs:
            assert r.done.wait(timeout=120)
            assert r.error is None, r.error
            assert len(r.tokens) == 12
        assert state["failed"], "the injected failure never fired"
        assert orch.stats.get("decode_recoveries") == 1
    finally:
        orch.stop()
        engine.generate, engine.generate_n = orig_generate, orig_generate_n
    # greedy parity with uninterrupted decode
    assert reqs[0].tokens == engine.generate_stream(np.array([3, 5, 7], np.int32), 12)
    assert reqs[1].tokens == engine.generate_stream(np.array([11, 13], np.int32), 12)


def test_http_server_roundtrip(engine):
    from http.server import ThreadingHTTPServer

    import maxtext_indextts2_tpu.infer.server as server_mod

    orch = Orchestrator(engine)
    orch.start()

    # build the handler the same way serve() does, on an ephemeral port
    import json as _json
    from http.server import BaseHTTPRequestHandler

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers.get("Content-Length", 0))
            body = _json.loads(self.rfile.read(length) or "{}")
            req = orch.submit(np.asarray(body["prompt"], np.int32),
                              int(body.get("max_new_tokens", 8)))
            req.done.wait(timeout=120)
            payload = _json.dumps({"tokens": req.tokens}).encode()
            self.send_response(200)
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def log_message(self, *a):
            pass

    httpd = ThreadingHTTPServer(("127.0.0.1", 0), Handler)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/generate",
            data=json.dumps({"prompt": [3, 5, 7], "max_new_tokens": 5}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = json.loads(resp.read())
        assert len(out["tokens"]) == 5
    finally:
        httpd.shutdown()
        orch.stop()

def test_tts_batcher_groups_concurrent_requests():
    """Concurrent /tts submissions within the window run as ONE
    synthesize_batch call; results route back to their own request."""
    from maxtext_indextts2_tpu.infer.server import TTSBatcher

    calls = []

    class FakePipeline:
        def synthesize_batch(self, bodies, pad_to_batch=None):
            calls.append(len(bodies))
            return [(np.full(3, float(len(b["text"]))), {"n": len(bodies)})
                    for b in bodies]

    b = TTSBatcher(FakePipeline(), max_batch=8, window_ms=200)
    b.start()
    try:
        reqs = [b.submit({"text": "x" * n}) for n in (1, 2, 3)]
        for r in reqs:
            assert r.done.wait(timeout=30)
            assert r.error is None
        assert calls == [3]  # one batch served all three
        for n, r in zip((1, 2, 3), reqs):
            wav, info = r.result
            assert wav[0] == float(n) and info["n"] == 3
    finally:
        b.stop()


def test_tts_batcher_lm_via_orchestrator(engine):
    """With an orchestrator attached, the batcher's stage-1 LM generation
    goes through the shared continuous-batching slots (generate_fn hook) and
    matches direct engine decode."""
    from maxtext_indextts2_tpu.infer.server import TTSBatcher

    captured = {}

    class FakePipeline:
        def synthesize_batch(self, bodies, generate_fn=None, pad_to_batch=None):
            assert generate_fn is not None
            prompts = [np.asarray(b["prompt"], np.int32) for b in bodies]
            captured["tokens"] = generate_fn(prompts, [5] * len(bodies))
            return [(np.zeros(1), {}) for _ in bodies]

    orch = Orchestrator(engine)
    orch.start()
    b = TTSBatcher(FakePipeline(), max_batch=4, window_ms=100, orchestrator=orch)
    b.start()
    try:
        reqs = [b.submit({"text": "a", "prompt": [3, 5, 7]}),
                b.submit({"text": "b", "prompt": [2, 4, 6]})]
        for r in reqs:
            assert r.done.wait(timeout=120) and r.error is None, r.error
        want = [engine.generate_stream(np.array([3, 5, 7], np.int32), 5),
                engine.generate_stream(np.array([2, 4, 6], np.int32), 5)]
        assert captured["tokens"] == want
    finally:
        b.stop()
        orch.stop()


def test_tts_batcher_partial_lm_failure_isolated(engine):
    """One poisoned stream must not kill its whole S2A batch: the batcher
    fails only the broken request and re-synthesizes the survivors with
    their already-generated tokens (_PartialLMFailure path)."""
    from maxtext_indextts2_tpu.infer.server import TTSBatcher

    calls = []

    class FakePipeline:
        def synthesize_batch(self, bodies, generate_fn=None, pad_to_batch=None):
            prompts = [np.asarray(b["prompt"], np.int32) for b in bodies]
            toks = generate_fn(prompts, [5] * len(bodies))
            calls.append(toks)
            return [(np.zeros(1), {"tokens": t}) for t in toks]

    orig = engine.prefill
    orig_many = engine.prefill_insert_many

    # poison the first request's prompt in BOTH admission paths: the fused
    # group dispatch fails as a whole, falls back to per-request admission
    # (fuse_ok=False), where the poisoned prompt fails alone at the attempt
    # limit while its cohort proceeds
    def poisoned_for_first(prompt, true_len):
        if prompt[0] == 3:  # first request's prompt
            raise RuntimeError("TPU backend error (Internal)")
        return orig(prompt, true_len)

    def poisoned_many(state, prompts, slots):
        if any(p[0] == 3 for p in prompts):
            raise RuntimeError("TPU backend error (Internal)")
        return orig_many(state, prompts, slots)

    engine.prefill = poisoned_for_first
    engine.prefill_insert_many = poisoned_many
    orch = Orchestrator(engine)
    orch.max_prefill_attempts = 2
    orch.start()
    b = TTSBatcher(FakePipeline(), max_batch=4, window_ms=100, orchestrator=orch)
    b.start()
    try:
        reqs = [b.submit({"text": "a", "prompt": [3, 5, 7]}),
                b.submit({"text": "b", "prompt": [2, 4, 6]})]
        assert reqs[0].done.wait(timeout=120) and reqs[1].done.wait(timeout=120)
        assert reqs[0].error is not None and "LM generation failed" in reqs[0].error
        assert reqs[1].error is None
        # the survivor's second pass reused the tokens already generated
        engine.prefill = orig
        engine.prefill_insert_many = orig_many
        want = engine.generate_stream(np.array([2, 4, 6], np.int32), 5)
        assert calls[-1] == [want]
        assert reqs[1].result[1]["tokens"] == want
    finally:
        b.stop()
        orch.stop()
        engine.prefill = orig
        engine.prefill_insert_many = orig_many


def test_tts_batcher_phased_device_loop(engine):
    """With a pipeline exposing the phase methods, every device stage runs
    as a device-loop thunk on the ORCHESTRATOR thread (run_on_loop) — the
    batcher thread never dispatches; a failed stream is dropped while the
    survivors continue into the S2A phase with their frontend outputs."""
    from maxtext_indextts2_tpu.infer.server import TTSBatcher

    loop_thread_ids = []

    class PhasedFake:
        def frontend_batch(self, bodies, pad_to_batch=None):
            loop_thread_ids.append(threading.get_ident())
            return ([np.zeros(2, np.int32)] * len(bodies),
                    [np.zeros((2, 1), np.int32)] * len(bodies))

        def text_and_prompt_to_lm_prompt(self, text, sem):
            return np.asarray([3, 5, 7] if text == "bad" else [2, 4, 6],
                              np.int32)

        def map_semantic(self, out, force_frames=False):
            return list(out)

        def s2a_vocoder_batch(self, bodies, sems, acs, gens,
                              pad_to_batch=None, **kw):
            loop_thread_ids.append(threading.get_ident())
            return [(np.zeros(1), {"tokens": g}) for g in gens]

    orig = engine.prefill
    orig_many = engine.prefill_insert_many

    # poison the "bad" prompt in both admission paths (fused group dispatch
    # + the per-request fallback it degrades to)
    def poisoned_for_bad(prompt, true_len):
        if prompt[0] == 3:
            raise RuntimeError("TPU backend error (Internal)")
        return orig(prompt, true_len)

    def poisoned_many(state, prompts, slots):
        if any(p[0] == 3 for p in prompts):
            raise RuntimeError("TPU backend error (Internal)")
        return orig_many(state, prompts, slots)

    engine.prefill = poisoned_for_bad
    engine.prefill_insert_many = poisoned_many
    orch = Orchestrator(engine)
    orch.max_prefill_attempts = 2
    orch.start()
    b = TTSBatcher(PhasedFake(), max_batch=4, window_ms=100, orchestrator=orch)
    b.start()
    try:
        reqs = [b.submit({"text": "bad", "max_new_tokens": 5}),
                b.submit({"text": "ok", "max_new_tokens": 5})]
        assert reqs[0].done.wait(timeout=120) and reqs[1].done.wait(timeout=120)
        assert reqs[0].error is not None and "LM generation" in reqs[0].error
        assert reqs[1].error is None, reqs[1].error
        engine.prefill = orig
        engine.prefill_insert_many = orig_many
        want = engine.generate_stream(np.array([2, 4, 6], np.int32), 5)
        assert reqs[1].result[1]["tokens"] == want
        # every phase thunk ran on the orchestrator's decode thread
        assert set(loop_thread_ids) == {orch._thread.ident}
    finally:
        b.stop()
        orch.stop()
        engine.prefill = orig
        engine.prefill_insert_many = orig_many


def test_orchestrator_prefill_refresh_on_streak(engine):
    """Two consecutive prefill failures trigger an executable refresh
    (engine.refresh_prefill) — recovery for a relay-poisoned loaded
    program — and the counter is surfaced at /metrics."""
    from maxtext_indextts2_tpu.infer.server import Orchestrator as Orch

    refreshes = {"n": 0}
    orig_refresh = engine.refresh_prefill

    def counting_refresh():
        refreshes["n"] += 1
        orig_refresh()

    calls = {"n": 0}
    orig = engine.prefill_insert_many

    def flaky(state, prompts, slots):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise RuntimeError("TPU backend error (Internal)")
        return orig(state, prompts, slots)

    engine.refresh_prefill = counting_refresh
    engine.prefill_insert_many = flaky
    orch = Orch(engine)
    orch.start()
    try:
        r = orch.submit(np.array([3, 5, 7], np.int32), 5)
        assert r.done.wait(timeout=120)
        assert r.error is None
        assert refreshes["n"] == 1
        assert orch.stats.get("prefill_refreshes", 0) == 1
    finally:
        orch.stop()
        engine.prefill_insert_many = orig
        engine.refresh_prefill = orig_refresh


def test_tts_batcher_error_propagates():
    from maxtext_indextts2_tpu.infer.server import TTSBatcher

    class BrokenPipeline:
        def synthesize_batch(self, bodies, pad_to_batch=None):
            raise RuntimeError("boom")

    b = TTSBatcher(BrokenPipeline(), max_batch=4, window_ms=10)
    b.start()
    try:
        r = b.submit({"text": "x"})
        assert r.done.wait(timeout=30)
        assert r.error is not None and "boom" in r.error
    finally:
        b.stop()


def test_grpc_server_streaming_decode(engine):
    """gRPC Decode streams tokens and matches greedy single-stream decode
    (reference: jetstream Orchestrator.Decode server-streaming rpc)."""
    grpc = pytest.importorskip("grpc")

    from maxtext_indextts2_tpu.infer.grpc_server import (
        OrchestratorStub, create_server)
    from maxtext_indextts2_tpu.infer.proto import orchestrator_pb2 as pb

    orch = Orchestrator(engine)
    orch.start()
    server = create_server(orch, port=0)
    server.start()
    try:
        chan = grpc.insecure_channel(f"127.0.0.1:{server._mtt_port}")
        stub = OrchestratorStub(chan)
        hc = stub.HealthCheck(pb.HealthCheckRequest(), timeout=30)
        assert hc.ok

        msgs = list(stub.Decode(
            pb.DecodeRequest(token_ids=[3, 5, 7], max_tokens=5), timeout=120))
        toks = [t for m in msgs for t in m.token_ids]
        assert msgs[-1].done and not msgs[-1].error
        assert toks == engine.generate_stream(np.array([3, 5, 7], np.int32), 5)
        # streaming: tokens must not all arrive in one final message
        assert len(msgs) >= 2

        # empty request surfaces an error without wedging the stream
        bad = list(stub.Decode(pb.DecodeRequest(), timeout=30))
        assert bad[-1].done and "empty" in bad[-1].error
        chan.close()
    finally:
        server.stop(grace=0)
        orch.stop()

def test_grpc_synthesize_chunked_wav(engine):
    """Synthesize streams the waveform as <4MiB f32 chunks with metadata."""
    grpc = pytest.importorskip("grpc")

    import maxtext_indextts2_tpu.infer.grpc_server as gs
    from maxtext_indextts2_tpu.infer.grpc_server import (
        OrchestratorStub, create_server)
    from maxtext_indextts2_tpu.infer.proto import orchestrator_pb2 as pb

    class FakePipeline:
        def synthesize(self, text, w16, w24, max_new_tokens=256):
            assert text == "hi" and len(w16) == 4 and len(w24) == 6
            return np.arange(2048, dtype=np.float32), {"sample_rate": 22050,
                                                       "tokens": 7}

    orch = Orchestrator(engine)
    orch.start()
    server = create_server(orch, tts_pipeline=FakePipeline(), port=0)
    server.start()
    old_chunk = gs._WAV_CHUNK_SAMPLES
    gs._WAV_CHUNK_SAMPLES = 1000  # force multi-chunk
    try:
        chan = grpc.insecure_channel(f"127.0.0.1:{server._mtt_port}")
        stub = OrchestratorStub(chan)
        msgs = list(stub.Synthesize(pb.SynthesizeRequest(
            text="hi", prompt_wav_16k=[0.0] * 4, prompt_wav_24k=[0.0] * 6),
            timeout=60))
        assert len(msgs) == 3 and msgs[-1].done
        wav = np.concatenate(
            [np.frombuffer(m.wav_f32le, "<f4") for m in msgs])
        np.testing.assert_array_equal(wav, np.arange(2048, dtype=np.float32))
        assert msgs[-1].sample_rate == 22050
        assert json.loads(msgs[-1].info_json)["tokens"] == 7
        chan.close()
    finally:
        gs._WAV_CHUNK_SAMPLES = old_chunk
        server.stop(grace=0)
        orch.stop()


def test_orchestrator_paged_engine(engine):
    """Continuous batching through the PAGED engine: the orchestrator's
    submit/prefill/insert/generate loop must produce the same greedy tokens
    as the dense engine (paged_attention=true end-to-end at the serving
    layer, not just Engine unit parity)."""
    import time

    paged_cfg = load_config(CFG + [
        "paged_attention=true", "pagedattn_num_pages=32",
        "pagedattn_tokens_per_page=8",
    ])
    paged = Engine(paged_cfg, mesh=engine.mesh)
    paged.params = engine.params

    orch = Orchestrator(paged, steps_per_dispatch=2)
    orch.start()
    try:
        prompts = [np.array([3, 5, 7], np.int32), np.array([11, 13], np.int32)]
        reqs = [orch.submit(p, 6) for p in prompts]
        for r in reqs:
            assert r.done.wait(timeout=120), "request did not finish"
        for p, r in zip(prompts, reqs):
            assert r.error is None, r.error
            assert r.tokens == engine.generate_stream(p, 6)
    finally:
        orch.stop()


def test_orchestrator_paged_pool_recycles_across_many_requests(engine):
    """A tiny page pool must serve MANY sequential requests: finished slots
    release their pages (and stop growing new ones), and admission reserves
    worst-case pages so the device allocator can never exhaust silently."""
    paged_cfg = load_config(CFG + [
        "paged_attention=true", "pagedattn_num_pages=12",
        "pagedattn_tokens_per_page=8",
    ])
    paged = Engine(paged_cfg, mesh=engine.mesh)
    paged.params = engine.params

    orch = Orchestrator(paged, steps_per_dispatch=2)
    orch.start()
    try:
        prompt = np.array([3, 5, 7], np.int32)
        want = engine.generate_stream(prompt, 6)
        # 6 waves of num_slots concurrent requests through an 11-free-page
        # pool: without recycling the pool exhausts after the first waves
        # and the null page silently cross-contaminates the KV
        for _ in range(6):
            reqs = [orch.submit(prompt, 6) for _ in range(paged.num_slots)]
            for r in reqs:
                assert r.done.wait(timeout=120), "request did not finish"
            for r in reqs:
                assert r.error is None, r.error
                assert r.tokens == want
        assert int(orch._pages_reserved.sum()) == 0
    finally:
        orch.stop()


def test_run_on_loop_fails_fast_after_loop_exit(engine):
    """Once the device loop has exited (stop() or unrecoverable device),
    run_on_loop must fail immediately — queued thunks used to block their
    callers for the full 600 s thunk timeout."""
    import time

    orch = Orchestrator(engine)
    orch.start()
    orch.stop()
    t0 = time.monotonic()
    with pytest.raises(RuntimeError):
        orch.run_on_loop(lambda: 1, timeout=600)
    assert time.monotonic() - t0 < 10


def test_paged_reservation_covers_dispatch_overshoot(engine):
    """Constant dispatch depth can advance a slot up to spd-1 steps past
    prompt+max_new before host-side emission finishes it; admission must
    reserve those pages too or a full pool can silently hand the stream
    the null page."""
    from maxtext_indextts2_tpu.infer.server import _Request

    paged_cfg = load_config(CFG + [
        "paged_attention=true", "pagedattn_num_pages=32",
        "pagedattn_tokens_per_page=8",
    ])
    paged = Engine(paged_cfg, mesh=engine.mesh)
    paged.params = engine.params
    orch = Orchestrator(paged, steps_per_dispatch=4)
    # prompt 3 + max_new 5 = 8 tokens = exactly 1 page of 8 — but depth-4
    # dispatch can write up to 3 positions past that, needing a 2nd page
    req = _Request(np.zeros(3, np.int32), 5)
    assert orch._pages_needed(req) == 2
    solo = Orchestrator(paged, steps_per_dispatch=1)
    assert solo._pages_needed(req) == 1


def test_tts_batcher_force_frames_gated_server_side():
    """force_frames disables EOS termination — a load-test knob an
    untrusted /tts client must not control. The batcher strips it unless
    the server was built with allow_force_frames."""
    from maxtext_indextts2_tpu.infer.server import TTSBatcher

    seen = []

    class FakePipeline:
        def synthesize_batch(self, bodies, pad_to_batch=None):
            seen.extend(bodies)
            return [(np.zeros(3), {}) for _ in bodies]

    for allow in (False, True):
        seen.clear()
        b = TTSBatcher(FakePipeline(), max_batch=2, window_ms=10,
                       allow_force_frames=allow)
        b.start()
        try:
            r = b.submit({"text": "hi", "force_frames": True})
            assert r.done.wait(timeout=30) and r.error is None
            assert ("force_frames" in seen[0]) == allow
        finally:
            b.stop()


def test_submit_length_guards(engine):
    """Decoding past max_target_length silently clamps the KV write onto
    the last cache row (device-verified) — submit must clamp max_new_tokens
    to the context budget and reject prompts the prefill bucket can't hold,
    so one bad request can't corrupt its slot or poison the loop."""
    cfg = engine.cfg  # bucket 16, context 64
    orch = Orchestrator(engine, steps_per_dispatch=4)
    orch.start()
    try:
        # over-length prompt: fails fast without ever reaching the device
        r = orch.submit(np.arange(cfg.max_prefill_predict_length + 1,
                                  dtype=np.int32) % 7, 4)
        assert r.done.wait(timeout=30)
        assert r.error is not None and "exceeds serving limits" in r.error

        # oversized max_new_tokens: clamped to context - prompt - (spd-1)
        prompt = np.array([3, 5, 7], np.int32)
        budget = cfg.max_target_length - len(prompt) - 3
        r = orch.submit(prompt, 10_000)
        assert r.done.wait(timeout=120)
        assert r.error is None
        assert len(r.tokens) == budget
    finally:
        orch.stop()
