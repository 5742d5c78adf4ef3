"""Continuous-batching inference server.

TPU-native counterpart of the reference's JetStream serving stack
(MaxText/maxengine_server.py: gRPC port 9000 + orchestrator driving
prefill/insert/generate slots). Here the orchestrator is in-process and the
transport is a dependency-free HTTP/JSON server (stdlib): POST /generate
{"prompt": [ids...], "max_new_tokens": N} -> {"tokens": [...]}.

The decode thread runs generate() continuously while any slot is active;
prefill requests are interleaved between generate steps (interleaved serving
mode, reference maxengine_config.py).
"""

from __future__ import annotations

import json
import queue
import threading
import time
from dataclasses import dataclass, field

import numpy as np

from maxtext_indextts2_tpu.config import Config
from maxtext_indextts2_tpu.infer.engine import Engine
from maxtext_indextts2_tpu.utils.dispatch_lock import device_dispatch


@dataclass
class _Request:
    prompt: np.ndarray
    max_new_tokens: int
    done: threading.Event = field(default_factory=threading.Event)
    tokens: list[int] = field(default_factory=list)
    error: str | None = None
    # When set, every generated token is also pushed here as it is produced
    # (gRPC streaming Decode); a final None marks end-of-stream.
    stream_q: queue.Queue | None = None
    # prefill attempts so far — transient dispatch failures (observed: the
    # axon relay throws 'TPU backend error (Internal)' sporadically under
    # sustained load) retry instead of failing the request
    attempts: int = 0
    # cleared when a FUSED admission dispatch containing this request
    # failed: the request re-admits individually so one poisoned prompt
    # cannot burn its cohort's retry budget (failure isolation)
    fuse_ok: bool = True


class Orchestrator:
    """Slot scheduler: request queue -> prefill -> insert -> shared generate loop.

    mode="interleaved" (default): one loop alternates prefill and generate —
    lowest latency at small scale. mode="disaggregated": a dedicated prefill
    thread feeds a prefix queue while the decode loop only generates/inserts —
    prefill bursts no longer stall decoding (reference: maxengine_config.py
    interleaved/disaggregated factories; there the split is across machines,
    here across threads sharing one chip's two program streams)."""

    def __init__(self, engine: Engine, eos_id: int | None = None,
                 steps_per_dispatch: int = 4, mode: str = "interleaved",
                 admission_fusion_max: int = 8):
        self.engine = engine
        self.eos_id = eos_id
        self.steps_per_dispatch = steps_per_dispatch
        self.mode = mode
        # fused admission group cap (engine.prefill_insert_many); <=1 keeps
        # the per-request prefill+insert path
        self.admission_fusion_max = admission_fusion_max
        self.prefix_queue: queue.Queue = queue.Queue(maxsize=max(engine.num_slots, 2))
        self.queue: queue.Queue[_Request] = queue.Queue()
        self.slots: list[_Request | None] = [None] * engine.num_slots
        self.remaining = np.zeros(engine.num_slots, np.int32)
        # paged admission control: the device page allocator has no error
        # path inside jit (exhaustion would silently hand out the reserved
        # null page), so admission reserves each request's WORST-CASE page
        # count host-side and refuses admission past the pool size.
        self._paged = bool(engine.cfg.paged_attention)
        if self._paged:
            self._tpp = int(engine.cfg.pagedattn_tokens_per_page)
            self._pages_total = int(engine.cfg.pagedattn_num_pages) - 1  # null
            self._pages_reserved = np.zeros(engine.num_slots, np.int64)
        # device-loop thunks: closures other threads need run ON the decode
        # thread (run_on_loop below). Through the axon relay, device use from
        # a second host thread fails at the runtime layer even when
        # lock-serialized (measured: the single-threaded latency_slo sweep
        # completes 486/486 while the threaded tts pipeline loses whole
        # batches to 'TPU backend error') — so the decode loop is THE device
        # thread and heavy stages time-slice it between decode dispatches.
        self._thunks: queue.Queue = queue.Queue()
        self._loop_dead = threading.Event()  # set when _loop exits for good
        self._held_prefix = None  # disaggregated: refused head-of-line prefix
        self._retry: list[_Request] = []  # prefill-failed requests, re-admitted first
        self.max_prefill_attempts = 6
        self._prefill_fail_streak = 0
        self.recover_deadline_s = 240.0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None
        self.decode_state = None
        # MTT_ORCH_TRACE=1: ring buffer of recent device calls, dumped on
        # decode failure — post-mortem for sustained-load fault isolation
        import collections
        import os

        self._trace: collections.deque | None = (
            collections.deque(maxlen=400)
            if os.environ.get("MTT_ORCH_TRACE") else None
        )
        # MTT_DISPATCH_PACE_MS: host-side gap inserted between decode
        # dispatches (sustained-load fault-isolation experiment; also a
        # fairness lever — gives admission/thunks a fixed share of the loop)
        self.dispatch_pace_s = float(
            os.environ.get("MTT_DISPATCH_PACE_MS", "0")) / 1e3
        # serving counters surfaced at /metrics (reference: maxengine_server
        # prometheus integration)
        self.stats = {
            "requests_total": 0,
            "requests_completed": 0,
            "tokens_generated_total": 0,
            "prefills_total": 0,
        }

    def start(self):
        if self.engine.params is None:
            self.engine.load_params()
        self.decode_state = self.engine.init_decode_state()
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        if self.mode == "disaggregated":
            self._prefill_thread = threading.Thread(
                target=self._prefill_loop, daemon=True
            )
            self._prefill_thread.start()

    def _prefill_loop(self):
        """Disaggregated mode: drain the request queue into prefilled
        prefixes independently of the decode loop."""
        while not self._stop.is_set():
            try:
                req = self.queue.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                self.stats["prefills_total"] += 1
                with device_dispatch():
                    prefix, first = self.engine.prefill(req.prompt, len(req.prompt))
                    first_tok = int(np.asarray(first)[0])
                self.prefix_queue.put((req, prefix, first_tok))
            except Exception as e:  # noqa: BLE001 — bounded retry, as in
                # the interleaved admission path
                req.attempts += 1
                if req.attempts < self.max_prefill_attempts:
                    self.queue.put(req)
                else:
                    self._fail(req, e)

    def stop(self):
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=5)

    def run_on_loop(self, fn, timeout: float = 600.0):
        """Run ``fn()`` on the device loop between decode dispatches and
        return its result (raises its exception). Used by the TTS batcher
        for the S2A/vocoder stages so ALL device work stays on one thread.

        Fails fast (instead of waiting out ``timeout``) when the device
        loop has exited — unrecoverable device, or stop()."""
        if self._loop_dead.is_set():
            raise RuntimeError("device loop is not running")
        box = {"done": threading.Event(), "fn": fn}
        self._thunks.put(box)
        if self._loop_dead.is_set():
            # the loop may have exited between its final drain and our put;
            # complete anything still queued (idempotent) so we don't hang
            self._fail_pending_thunks(RuntimeError("device loop exited"))
        if not box["done"].wait(timeout):
            raise TimeoutError("device-loop thunk timed out")
        if "error" in box:
            raise box["error"]
        return box["result"]

    def _drain_thunks(self, limit: int = 1):
        """Run up to ``limit`` queued thunks on this (the device) thread."""
        for _ in range(limit):
            try:
                box = self._thunks.get_nowait()
            except queue.Empty:
                return
            try:
                box["result"] = box["fn"]()
            except Exception as e:  # noqa: BLE001 — re-raised in the caller
                box["error"] = e
            box["done"].set()

    def _fail_pending_thunks(self, err: Exception):
        """Complete every queued thunk with ``err`` (device loop exiting:
        the thunks will never run, their callers must not block out the
        full timeout)."""
        while True:
            try:
                box = self._thunks.get_nowait()
            except queue.Empty:
                return
            if not box["done"].is_set():
                box["error"] = err
                box["done"].set()

    def submit(self, prompt: np.ndarray, max_new_tokens: int,
               stream: bool = False) -> _Request:
        req = _Request(np.asarray(prompt, np.int32), int(max_new_tokens),
                       stream_q=queue.Queue() if stream else None)
        self.stats["requests_total"] += 1
        # length guards: decoding past max_target_length does NOT error —
        # the device clamps the KV write onto the last cache row (verified
        # on-chip), silently corrupting that stream — and a prompt longer
        # than the prefill bucket can't prefill at all. Reject/clamp
        # host-side so one bad request can't poison its slot.
        cfg = self.engine.cfg
        overshoot = max(0, self.steps_per_dispatch - 1)
        budget = cfg.max_target_length - len(req.prompt) - overshoot
        if len(req.prompt) > cfg.max_prefill_predict_length or budget < 1:
            self._fail(req, ValueError(
                f"prompt length {len(req.prompt)} exceeds serving limits "
                f"(prefill bucket {cfg.max_prefill_predict_length}, "
                f"context {cfg.max_target_length}, dispatch depth "
                f"{self.steps_per_dispatch})"))
            return req
        req.max_new_tokens = min(req.max_new_tokens, budget)
        self.queue.put(req)
        return req

    # ------------------------------------------------------------- internals
    def _free_slot(self) -> int | None:
        for i, r in enumerate(self.slots):
            if r is None:
                return i
        return None

    def _emit(self, req: _Request, tok: int):
        req.tokens.append(tok)
        self.stats["tokens_generated_total"] += 1
        if req.stream_q is not None:
            req.stream_q.put(tok)

    def _fail(self, req: _Request, e: Exception):
        req.error = repr(e)
        if req.stream_q is not None:
            req.stream_q.put(None)
        req.done.set()

    def _tr(self, op: str, **kw):
        if self._trace is not None:
            self._trace.append((round(time.monotonic(), 4), op, kw))

    def _pages_needed(self, req: _Request) -> int:
        # Constant dispatch depth lets the device advance an active slot's
        # position up to steps_per_dispatch-1 steps past prompt+max_new
        # before host-side emission finishes the slot — reserve that
        # overshoot too, or a full pool could push the allocator onto the
        # reserved null page (silent KV corruption, the exact failure this
        # admission control exists to prevent).
        overshoot = max(0, self.steps_per_dispatch - 1)
        return -(-(len(req.prompt) + req.max_new_tokens + overshoot) // self._tpp)

    def _can_admit(self, req: _Request) -> bool:
        if not self._paged:
            return True
        return (
            int(self._pages_reserved.sum()) + self._pages_needed(req)
            <= self._pages_total
        )

    def _admit(self, slot, req, prefix, first_tok):
        self._tr("insert", slot=slot)
        self.decode_state = self.engine.insert(prefix, self.decode_state, slot)
        self._admit_bookkeeping(slot, req, first_tok)

    def _admit_bookkeeping(self, slot, req, first_tok):
        """Host-side slot bookkeeping once the prefix is device-side —
        shared by the per-request insert path and fused admission (where
        the insert already happened inside prefill_insert_many)."""
        self._emit(req, first_tok)
        self.slots[slot] = req
        self.remaining[slot] = req.max_new_tokens - 1
        if self._paged:
            self._pages_reserved[slot] = self._pages_needed(req)
        if self.remaining[slot] <= 0 or first_tok == self.eos_id:
            self._finish(slot)

    def _loop(self):
        try:
            self._loop_body()
        finally:
            # whatever the exit path (stop(), unrecoverable device, or an
            # unexpected exception), queued thunks must fail fast rather
            # than block their callers for the full thunk timeout
            self._loop_dead.set()
            self._fail_pending_thunks(RuntimeError("device loop exited"))

    def _next_admissible(self) -> _Request | None:
        """Pop the next admissible request (retry list first), or None."""
        if self._retry:
            if not self._can_admit(self._retry[0]):
                return None
            return self._retry.pop(0)
        try:
            req = self.queue.queue[0]  # peek before committing
        except IndexError:
            return None
        if not self._can_admit(req):
            return None  # head-of-line waits for pages to free up
        return self.queue.get_nowait()

    def _on_prefill_failure(self, reqs: list[_Request], e: Exception):
        """Bounded-retry bookkeeping shared by the admission paths."""
        self.stats["prefill_failures"] = (
            self.stats.get("prefill_failures", 0) + 1
        )
        if self.stats["prefill_failures"] <= 2:
            import sys
            import traceback

            print(f"[orch] prefill failure "
                  f"#{self.stats['prefill_failures']} at "
                  f"t={time.monotonic():.1f} active="
                  f"{self.active_slots()}:\n"
                  f"{traceback.format_exc()}", file=sys.stderr)
        self._prefill_fail_streak += 1
        if self._prefill_fail_streak >= 2:
            # repeated failures while decode keeps working = poisoned
            # prefill executable (engine.refresh_prefill docstring);
            # reload a fresh one before retrying
            self.engine.refresh_prefill()
            self.stats["prefill_refreshes"] = (
                self.stats.get("prefill_refreshes", 0) + 1
            )
            self._prefill_fail_streak = 0
        for req in reqs:
            req.attempts += 1
            if req.attempts < self.max_prefill_attempts:
                self._retry.append(req)
            else:
                self._fail(req, e)

    def _admit_interleaved(self) -> bool:
        """Admission for interleaved mode: FUSED — pack every admissible
        request (up to free slots / the prefill bucket) and admit each group
        as ONE device dispatch (engine.prefill_insert_many: packed prefill +
        multi-insert + first-token sampling in a single XLA program). The
        unfused path costs 2 dispatches per stream; at ~40 ms/dispatch
        through a relay-attached host, steady-state admission of ~8
        streams/batch cost more than the decode work it fed. Group sizes are
        bucketed to powers of two so the loaded-executable set stays bounded
        (loaded-program space is a real resource, PERF.md round-3)."""
        cfg = self.engine.cfg
        admitted = False
        while True:
            free = [i for i, r in enumerate(self.slots) if r is None]
            if not free:
                return admitted
            # solo-fallback head: a request whose fused group failed
            # re-admits individually (one poisoned prompt must not burn its
            # cohort's retry budget — and must fail ALONE at the bounded
            # attempt limit while its cohort proceeds)
            if self._retry and not self._retry[0].fuse_ok:
                if not self._can_admit(self._retry[0]):
                    return admitted
                req = self._retry.pop(0)
                if not self._admit_via_prefill(free[0], req):
                    return admitted  # let a decode round run between attempts
                admitted = True
                continue
            group: list[_Request] = []
            plen = 0
            max_k = min(len(free), max(1, self.admission_fusion_max))
            while len(group) < max_k:
                if self._retry and not self._retry[0].fuse_ok:
                    break  # solo head handled next round, not pulled in here
                req = self._next_admissible()
                if req is None:
                    break
                if group and plen + len(req.prompt) > cfg.max_prefill_predict_length:
                    # doesn't fit this pack — lead the next group
                    self._retry.insert(0, req)
                    break
                group.append(req)
                plen += len(req.prompt)
            if not group:
                return admitted
            # ladder sizes {1,2,4,8,...}: one executable per size, reused
            k = 1
            while k * 2 <= len(group):
                k *= 2
            # slice-assign keeps the overflow's arrival order (per-item
            # insert(0, ...) in forward iteration would reverse it)
            self._retry[:0] = group[k:]
            group = group[:k]
            slots = free[:k]
            try:
                self.stats["prefills_total"] += len(group)
                self._tr("prefill_insert", slots=slots,
                         plens=[len(r.prompt) for r in group])
                with device_dispatch():
                    self.decode_state, firsts = self.engine.prefill_insert_many(
                        self.decode_state, [r.prompt for r in group], slots
                    )
                    firsts = np.asarray(firsts)
                for slot, req, tok in zip(slots, group, firsts):
                    self._admit_bookkeeping(slot, req, int(tok))
                admitted = True
                self._prefill_fail_streak = 0
            except Exception as e:  # noqa: BLE001 — transient dispatch
                # failures retry (bounded); persistent ones surface to the
                # caller. Return so a decode step (or the idle sleep) runs
                # between attempts instead of hammering a wedged path.
                if len(group) > 1:
                    # failure isolation: re-admit each member individually so
                    # a single poisoned prompt fails alone at the attempt
                    # limit instead of taking its cohort down with it
                    self.stats["admission_fusion_fallbacks"] = (
                        self.stats.get("admission_fusion_fallbacks", 0) + 1
                    )
                    for req in group:
                        req.fuse_ok = False
                    self._retry[:0] = group
                else:
                    self._on_prefill_failure(group, e)
                # prefill_insert_many donates decode_state: a failed dispatch
                # can leave self.decode_state pointing at deleted buffers.
                # With no active streams (cold-start burst) no decode round
                # runs to trigger _recover_decode, so every solo retry would
                # hit the dead state until the attempt budget burns out —
                # rebuild here if the buffers are gone.
                if not self._ensure_live_decode_state(e):
                    self._stop.set()
                    while True:
                        try:
                            self._fail(self.queue.get_nowait(), e)
                        except queue.Empty:
                            break
                return admitted

    def _admit_via_prefill(self, slot: int, req: _Request) -> bool:
        """Single-request admission (separate prefill + insert dispatches);
        the solo-fallback path for fused-group failures and the body of
        _admit_sequential."""
        try:
            self.stats["prefills_total"] += 1
            self._tr("prefill", slot=slot, plen=len(req.prompt))
            with device_dispatch():
                prefix, first = self.engine.prefill(req.prompt, len(req.prompt))
                first_tok = int(np.asarray(first)[0])
                self._admit(slot, req, prefix, first_tok)
            self._prefill_fail_streak = 0
            return True
        except Exception as e:  # noqa: BLE001 — bounded retry
            self._on_prefill_failure([req], e)
            return False

    def _loop_body(self):
        while not self._stop.is_set():
            # admit new requests into free slots
            admitted = False
            if (self.mode != "disaggregated" and not self._paged
                    and self.admission_fusion_max > 1):
                admitted = self._admit_interleaved()
            else:
                # disaggregated, paged, or fusion disabled (<=1): the
                # documented per-request prefill+insert path
                admitted = self._admit_sequential()

            self._drain_thunks()
            if not any(r is not None for r in self.slots):
                if not admitted:
                    time.sleep(0.001)
                continue
            if self._decode_round():
                continue
            return

    def _admit_sequential(self) -> bool:
        """Per-request admission (disaggregated mode's prefix queue, and the
        paged path — page reservation is per-slot host bookkeeping around
        each insert)."""
        admitted = False
        while True:
            slot = self._free_slot()
            if slot is None:
                break
            if self.mode == "disaggregated":
                if self._held_prefix is None:
                    try:
                        self._held_prefix = self.prefix_queue.get_nowait()
                    except queue.Empty:
                        break
                req, prefix, first_tok = self._held_prefix
                if not self._can_admit(req):
                    break  # head-of-line waits for pages to free up
                self._held_prefix = None
                self._admit(slot, req, prefix, first_tok)
                admitted = True
                continue
            req = self._next_admissible()
            if req is None:
                break
            if not self._admit_via_prefill(slot, req):
                break
            admitted = True
        return admitted

    def _decode_round(self) -> bool:
        """One decode dispatch + host-side emission. Returns False when the
        device is unrecoverable (the serving loop must exit)."""
        # amortize dispatch overhead: fuse several decode steps into one
        # jit dispatch. Slots finish MID-dispatch on the host side — the
        # emission loop below stops at each request's remaining count
        # (or eos) and frees the slot; the device decodes a finished
        # slot's garbage for at most n-1 steps (<1% of slot-steps at 128
        # slots) and release_slot resets it. This keeps depth at spd
        # under steady load — clamping to the MINIMUM remaining (tried
        # first) collapses depth whenever any of ~50 staggered streams
        # nears its finish, and single-step-when-any-finishes (the
        # original) starved tails outright (366/486, PERF.md). Depth
        # only shrinks in drain-out (max remaining < spd), rounded to
        # powers of two so the per-n jitted scan cache stays bounded.
        # constant dispatch depth: ONE decode executable for the whole
        # serving lifetime. Host-side emission clamps each stream at its
        # remaining count, so a shallower drain ladder only saves the
        # tail overshoot (< spd garbage steps per batch drain-out, <1%
        # of slot-steps) — while every extra depth is a separately
        # LOADED executable, and loaded-program space is a real
        # resource: program loads can fail with 'TPU backend error
        # (Internal)' once too many executables accumulate
        n = self.steps_per_dispatch
        if self.dispatch_pace_s > 0:
            time.sleep(self.dispatch_pace_s)
        self._tr("generate_n", n=n, active=self.active_slots())
        try:
            with device_dispatch():
                if n > 1:
                    self.decode_state, toks_n = self.engine.generate_n(
                        self.decode_state, n
                    )
                    toks_n = np.asarray(toks_n)  # [n, slots]
                else:
                    self.decode_state, toks = self.engine.generate(
                        self.decode_state
                    )
                    toks_n = np.asarray(toks)[None, :]
        except Exception as e:  # noqa: BLE001 — a dead decode step must
            # not strand in-flight streams blocked on their stream_q.
            # The donated decode state is unusable after a failed
            # dispatch, but the HOST knows everything each stream needs:
            # prompt + tokens emitted so far. Recovery RESUMES every
            # active stream by re-prefilling prompt+generated into a
            # fresh decode state (transient relay errors — observed
            # 'TPU backend error (Internal)' mid-run — cost one prefill
            # per active slot instead of mass-killing all in-flight
            # streams). Streams whose resume prefill also fails are
            # failed individually.
            self.stats["decode_failures"] = (
                self.stats.get("decode_failures", 0) + 1
            )
            if self._trace is not None:
                import sys

                print("[orch] device-call trace (oldest first):\n" +
                      "\n".join(repr(t) for t in self._trace),
                      file=sys.stderr)
            if self.stats["decode_failures"] <= 2:
                import sys
                import traceback

                print(f"[orch] decode failure "
                      f"#{self.stats['decode_failures']} at "
                      f"t={time.monotonic():.1f} active="
                      f"{self.active_slots()}:\n"
                      f"{traceback.format_exc()}", file=sys.stderr)
            if not self._recover_decode(e):
                # device unrecoverable: fail everything still queued and
                # stop serving instead of dying silently
                self._stop.set()
                while True:
                    try:
                        self._fail(self.queue.get_nowait(), e)
                    except queue.Empty:
                        break
                return False
            return True
        for step_toks in toks_n:
            for i, req in enumerate(self.slots):
                if req is None:
                    continue
                tok = int(step_toks[i])
                self._emit(req, tok)
                self.remaining[i] -= 1
                if self.remaining[i] <= 0 or (self.eos_id is not None and tok == self.eos_id):
                    self._finish(i)
        return True

    def _ensure_live_decode_state(self, err: Exception) -> bool:
        """After a failed dispatch that DONATED decode_state
        (prefill_insert_many / insert), the state may point at deleted
        device buffers. Keep it if it is still live (failure happened
        before launch, e.g. at trace time); otherwise run the full
        recovery path. Returns False when the device is unrecoverable."""
        import jax

        try:
            dead = any(
                getattr(leaf, "is_deleted", lambda: False)()
                for leaf in jax.tree_util.tree_leaves(self.decode_state)
            )
        except Exception:  # noqa: BLE001 — unreadable state counts as dead
            dead = True
        if not dead:
            return True
        return self._recover_decode(err)

    def _recover_decode(self, err: Exception) -> bool:
        """Rebuild the decode state after a failed decode dispatch and
        RESUME every active stream (prompt + tokens emitted so far are
        re-prefilled into its slot). Returns False when the device is
        unrecoverable (init_decode_state itself fails)."""
        survivors = [
            (i, req) for i, req in enumerate(self.slots) if req is not None
        ]
        self.slots = [None] * self.engine.num_slots
        if self._paged:
            self._pages_reserved[:] = 0
        import gc

        import jax

        # free the dead state's device buffers EXPLICITLY before rebuilding:
        # the failed dispatch donated the multi-GB decode state, and an
        # aborted execution can leave the donated buffers allocated
        # device-side — every init_decode_state retry then fails with the
        # same backend error (observed: rebuild refused for 240s straight
        # while the rest of the chip kept working)
        dead, self.decode_state = self.decode_state, None
        for leaf in jax.tree_util.tree_leaves(dead):
            if hasattr(leaf, "delete"):
                try:
                    leaf.delete()
                except Exception:  # noqa: BLE001 — already invalid is fine
                    pass
        del dead
        gc.collect()
        # transient runtime failures can take MINUTES to clear (measured:
        # the relay refuses program work for 1-10+ min after a blip, then
        # recovers) — rebuilding the decode state keeps retrying with
        # capped backoff for a few minutes before declaring the device
        # dead. In-flight streams stall but resume from host-held tokens.
        rebuilt = False
        deadline = time.monotonic() + self.recover_deadline_s
        backoff = 2.0
        while time.monotonic() < deadline and not self._stop.is_set():
            try:
                # fresh executables, not just fresh buffers: the loaded
                # decode programs themselves can be the poisoned part
                self.engine.refresh_decode()
                self.engine.refresh_prefill()
                with device_dispatch():
                    self.decode_state = self.engine.init_decode_state()
                rebuilt = True
                break
            except Exception:  # noqa: BLE001 — retried with backoff
                time.sleep(backoff)
                backoff = min(backoff * 1.6, 20.0)
        if not rebuilt:
            for _, req in survivors:
                self._fail(req, err)
            return False
        self.stats["decode_recoveries"] = self.stats.get("decode_recoveries", 0) + 1
        bucket = self.engine.cfg.max_prefill_predict_length
        for slot, req in survivors:
            resume = np.concatenate(
                [req.prompt, np.asarray(req.tokens, np.int32)]
            )
            try:
                with device_dispatch():
                    if len(resume) <= bucket:
                        prefix, first = self.engine.prefill(resume, len(resume))
                    else:
                        prefix, first = self.engine.prefill_chunked(
                            resume, len(resume), bucket
                        )
                    # re-admit into the same slot; the prefill's sampled
                    # token IS the stream's next token (greedy resume is
                    # exact)
                    self.decode_state = self.engine.insert(
                        prefix, self.decode_state, slot
                    )
                    first_tok = int(np.asarray(first)[0])
                self.slots[slot] = req
                if self._paged:
                    self._pages_reserved[slot] = self._pages_needed(req)
                self._emit(req, first_tok)
                self.remaining[slot] -= 1
                if self.remaining[slot] <= 0 or (
                    self.eos_id is not None and req.tokens[-1] == self.eos_id
                ):
                    self._finish(slot)
            except Exception as e2:  # noqa: BLE001 — this stream only
                self.slots[slot] = None
                if self._paged:
                    self._pages_reserved[slot] = 0
                self._fail(req, e2)
        return True

    def _finish(self, slot: int):
        req = self.slots[slot]
        self.slots[slot] = None
        # mark the slot inactive device-side (stops pos advance) and, in
        # paged mode, return its pages to the pool immediately — otherwise a
        # finished slot holds (and in decode keeps growing) pages until reuse
        self._tr("release", slot=slot)
        with device_dispatch():
            self.decode_state = self.engine.release_slot(self.decode_state, slot)
        if self._paged:
            self._pages_reserved[slot] = 0
        if req is not None:
            self.stats["requests_completed"] += 1
            if req.stream_q is not None:
                req.stream_q.put(None)
            req.done.set()

    def active_slots(self) -> int:
        return sum(1 for s in self.slots if s is not None)

    def metrics_text(self) -> str:
        """Prometheus text exposition format (stdlib-only)."""
        lines = []
        for k, v in self.stats.items():
            lines.append(f"# TYPE serving_{k} counter")
            lines.append(f"serving_{k} {v}")
        lines.append("# TYPE serving_active_slots gauge")
        lines.append(f"serving_active_slots {self.active_slots()}")
        lines.append("# TYPE serving_queue_depth gauge")
        lines.append(f"serving_queue_depth {self.queue.qsize()}")
        return "\n".join(lines) + "\n"


@dataclass
class _TTSRequest:
    body: dict
    done: threading.Event = field(default_factory=threading.Event)
    result: tuple | None = None
    error: str | None = None


class _PartialLMFailure(RuntimeError):
    """Some (not necessarily all) streams of a batched LM generation failed.

    ``tokens`` is aligned with the submitted batch: a token list per
    succeeded stream, None per failed one. ``errors`` collects the failure
    strings."""

    def __init__(self, tokens, errors):
        super().__init__(f"LM generation failed for "
                         f"{sum(t is None for t in tokens)}/{len(tokens)} "
                         f"streams: {errors[0] if errors else ''}")
        self.tokens = tokens
        self.errors = errors


class TTSBatcher:
    """Collect /tts requests into one masked S2A pass.

    Requests arriving within ``window_ms`` of each other (up to
    ``max_batch``) run as ONE pipeline.synthesize_batch call — batch-8 S2A
    is ~5x the per-request throughput (PERF.md). The reference has no TTS
    serving path at all (its S2A sampler is offline torch).
    """

    def __init__(self, pipeline, max_batch: int = 8, window_ms: int = 50,
                 orchestrator: "Orchestrator | None" = None,
                 allow_force_frames: bool = False):
        self.pipeline = pipeline
        self.max_batch = max(1, max_batch)
        self.window_s = window_ms / 1e3
        self.orch = orchestrator
        # force_frames disables EOS termination (full-frame-budget synthesis
        # per request) — a load-testing knob, not something an untrusted
        # /tts client may set. Enabled only by the bench harness
        # (cfg.tts_allow_force_frames); otherwise stripped at submit.
        self.allow_force_frames = allow_force_frames
        self.queue: queue.Queue[_TTSRequest] = queue.Queue()
        self._stop = threading.Event()
        self.thread = threading.Thread(target=self._loop, daemon=True)
        self.batches = 0
        self.requests = 0

    def _generate_via_orch(self, lm_prompts, max_tokens):
        """Stage-1 LM generation through the continuous-batching
        orchestrator: the whole batch shares decode slots instead of
        generating serially. A failed stream raises _PartialLMFailure so
        the batcher can fail THAT request and still synthesize the rest —
        without it one poisoned prefill kills a whole S2A batch."""
        reqs = [
            self.orch.submit(np.asarray(p, np.int32), int(m))
            for p, m in zip(lm_prompts, max_tokens)
        ]
        oks = []
        errs = []
        for r in reqs:
            if not r.done.wait(timeout=600):
                r.error = "LM generation timed out"
            oks.append(r.error is None)
            if r.error is not None:
                errs.append(str(r.error))
        if not all(oks):
            raise _PartialLMFailure(
                tokens=[r.tokens if ok else None for r, ok in zip(reqs, oks)],
                errors=errs,
            )
        return [r.tokens for r in reqs]

    def start(self):
        self.thread.start()

    def stop(self):
        self._stop.set()
        self.thread.join(timeout=5)

    def submit(self, body: dict) -> _TTSRequest:
        if not self.allow_force_frames:
            body.pop("force_frames", None)
        req = _TTSRequest(body=body)
        self.queue.put(req)
        return req

    def _loop(self):
        while not self._stop.is_set():
            try:
                first = self.queue.get(timeout=0.05)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.monotonic() + self.window_s
            while len(batch) < self.max_batch:
                wait = deadline - time.monotonic()
                if wait <= 0:
                    break
                try:
                    batch.append(self.queue.get(timeout=wait))
                except queue.Empty:
                    break
            phased = self.orch is not None and hasattr(
                self.pipeline, "frontend_batch")
            all_reqs = list(batch)  # done-signalling covers failed ones too
            try:
                if phased:
                    results, batch = self._run_phased(batch)
                else:
                    kw = ({"generate_fn": self._generate_via_orch}
                          if self.orch else {})
                    # fixed batch shape: one sampler compile regardless of
                    # how many requests the window collected
                    kw["pad_to_batch"] = self.max_batch
                    results = self.pipeline.synthesize_batch(
                        [r.body for r in batch], **kw
                    )
                for req, res in zip(batch, results):
                    req.result = res
            except _PartialLMFailure as e:
                # non-phased path only: fail the broken streams, re-run the
                # survivors with their ALREADY-GENERATED tokens
                survivors, cached = [], []
                for req, toks in zip(batch, e.tokens):
                    if toks is None:
                        req.error = f"{type(e).__name__}: {e}"
                    else:
                        survivors.append(req)
                        cached.append(toks)
                if survivors:
                    try:
                        results = self.pipeline.synthesize_batch(
                            [r.body for r in survivors],
                            generate_fn=lambda p, m: cached,
                            pad_to_batch=self.max_batch,
                        )
                        for req, res in zip(survivors, results):
                            req.result = res
                    except Exception as e2:  # noqa: BLE001
                        for req in survivors:
                            req.error = f"{type(e2).__name__}: {e2}"
            except Exception as e:  # noqa: BLE001 - surface to every caller
                for req in batch:
                    if req.error is None and req.result is None:
                        req.error = f"{type(e).__name__}: {e}"
            self.batches += 1
            self.requests += len(all_reqs)
            for req in all_reqs:
                req.done.set()

    def _run_phased(self, batch):
        """Serve one batch with every device stage as a device-loop thunk
        (Orchestrator.run_on_loop): frontend -> LM (continuous-batching
        slots) -> S2A+vocoder. The batcher thread itself never touches the
        device, so one host thread owns all dispatch. A stream whose LM
        generation failed is failed individually; the survivors continue to
        the S2A pass with the frontend outputs already in hand.

        Returns (results, survivors) aligned with each other."""
        pipeline, orch = self.pipeline, self.orch
        bodies = [r.body for r in batch]
        # pad_to_batch: one frontend executable for every arrival-batch size
        # (a mid-serving compile costs ~45 s through the relay)
        sems, acs = orch.run_on_loop(
            lambda: pipeline.frontend_batch(bodies, pad_to_batch=self.max_batch)
        )
        lm_prompts = [
            pipeline.text_and_prompt_to_lm_prompt(b["text"], s)
            for b, s in zip(bodies, sems)
        ]
        mnts = [int(b.get("max_new_tokens", 256)) for b in bodies]
        try:
            outs = self._generate_via_orch(lm_prompts, mnts)
        except _PartialLMFailure as e:
            keep = []
            for i, (req, toks) in enumerate(zip(batch, e.tokens)):
                if toks is None:
                    req.error = f"{type(e).__name__}: {e}"
                else:
                    keep.append(i)
            if not keep:
                return [], []
            batch = [batch[i] for i in keep]
            bodies = [bodies[i] for i in keep]
            sems = [sems[i] for i in keep]
            acs = [acs[i] for i in keep]
            outs = [e.tokens[i] for i in keep]
        gens = [
            pipeline.map_semantic(o, force_frames=bool(b.get("force_frames")))
            for o, b in zip(outs, bodies)
        ]
        results = orch.run_on_loop(lambda: pipeline.s2a_vocoder_batch(
            bodies, sems, acs, gens, pad_to_batch=self.max_batch))
        return results, batch


def make_server(cfg: Config, port: int | None = None,
                engine: Engine | None = None, tts_pipeline=None):
    """Build the HTTP server without blocking. Returns (httpd, orch,
    tts_batcher) — callers run httpd.serve_forever() themselves (serve())
    or in a thread (benchmarks/latency_slo.py drives load against it).

    Endpoints: POST /generate (token LM), POST /generate_stream (ndjson
    per-token streaming) and, when a TTS pipeline is provided, POST /tts
    {"text": ..., "prompt_wav_16k": [...], "prompt_wav_24k": [...]} ->
    {"wav": [...], "info": {...}}.
    """
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    orch = Orchestrator(
        engine or (tts_pipeline.engine if tts_pipeline else Engine(cfg)),
        steps_per_dispatch=cfg.serving_steps_per_dispatch,
        mode=cfg.serving_mode,
        admission_fusion_max=cfg.serving_admission_fusion_max,
    )
    orch.start()
    tts_batcher = None
    if tts_pipeline is not None:
        tts_batcher = TTSBatcher(
            tts_pipeline, cfg.tts_batch_max, cfg.tts_batch_window_ms,
            orchestrator=orch,
            allow_force_frames=cfg.tts_allow_force_frames,
        )
        tts_batcher.start()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            if self.path == "/tts" and tts_pipeline is not None:
                self._do_tts()
                return
            if self.path not in ("/generate", "/generate_stream"):
                self.send_error(404)
                return
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or "{}")
                prompt = np.asarray(body["prompt"], np.int32)
            except (json.JSONDecodeError, KeyError, ValueError) as e:
                msg = json.dumps({"error": f"bad request: {e}"}).encode()
                self.send_response(400)
                self.send_header("Content-Length", str(len(msg)))
                self.end_headers()
                self.wfile.write(msg)
                return
            if self.path == "/generate_stream":
                # per-token streaming (ndjson, connection closes at end):
                # the first line leaves as soon as prefill+insert lands, so
                # clients measure true TTFB (reference capability: JetStream
                # server-streaming Decode, maxengine_server.py:68-81)
                req = orch.submit(
                    prompt, int(body.get("max_new_tokens", 32)), stream=True
                )
                self.send_response(200)
                self.send_header("Content-Type", "application/x-ndjson")
                self.end_headers()
                while True:
                    try:
                        # failure paths enqueue a None sentinel; the timeout
                        # is a backstop so a wedged decode loop can't hold
                        # handler threads + sockets open forever
                        tok = req.stream_q.get(timeout=600)
                    except queue.Empty:
                        break
                    if tok is None:
                        break
                    try:
                        self.wfile.write(
                            json.dumps({"token": tok}).encode() + b"\n"
                        )
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        return
                # a failed request ends its stream with an explicit error
                # line — clients must be able to tell a server-side failure
                # from a short completion
                if req.error is not None:
                    try:
                        self.wfile.write(
                            json.dumps({"error": req.error}).encode() + b"\n"
                        )
                        self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                return
            req = orch.submit(prompt, int(body.get("max_new_tokens", 32)))
            req.done.wait(timeout=600)
            payload = json.dumps(
                {"tokens": req.tokens} if req.error is None else {"error": req.error}
            ).encode()
            self.send_response(200 if req.error is None else 500)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def _do_tts(self):
            length = int(self.headers.get("Content-Length", 0))
            try:
                body = json.loads(self.rfile.read(length) or "{}")
                body["text"]  # validate before enqueueing
                for k in ("prompt_wav_16k", "prompt_wav_24k"):
                    if k + "_b64" in body:  # binary prompt upload (float32 LE)
                        import base64

                        body[k] = np.frombuffer(
                            base64.b64decode(body.pop(k + "_b64")), np.float32
                        )
                req = tts_batcher.submit(body)
                finished = req.done.wait(timeout=870)
                if req.error is not None or not finished or req.result is None:
                    err = req.error or (
                        "timed out" if not finished else "no result")
                    payload = json.dumps({"error": err}).encode()
                    code = 500
                else:
                    wav, info = req.result
                    if body.get("wav_encoding") == "b64":
                        # base64 of little-endian float32 — ~7x smaller than
                        # a JSON float list and ~100x less GIL-held encode
                        # time (a 5 s/24 kHz utterance is 240k floats; the
                        # list path holds the GIL long enough to starve
                        # every other serving thread, measured in
                        # benchmarks/decode_soak.py gil mode)
                        import base64

                        wav32 = np.asarray(wav, np.float32)
                        payload = json.dumps(
                            {"wav_b64": base64.b64encode(wav32.tobytes()).decode(),
                             "dtype": "float32", "info": info}
                        ).encode()
                    else:
                        payload = json.dumps(
                            {"wav": np.asarray(wav).tolist(), "info": info}
                        ).encode()
                    code = 200
            except (json.JSONDecodeError, KeyError, ValueError) as e:
                payload = json.dumps({"error": f"bad request: {e}"}).encode()
                code = 400
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(payload)))
            self.end_headers()
            self.wfile.write(payload)

        def do_GET(self):
            if self.path == "/metrics":
                payload = orch.metrics_text().encode()
                self.send_response(200)
                self.send_header("Content-Type", "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(payload)))
                self.end_headers()
                self.wfile.write(payload)
                return
            self.send_response(200)  # health check
            self.end_headers()
            self.wfile.write(b"ok")

        def log_message(self, *a):
            pass

    server = ThreadingHTTPServer(("0.0.0.0", port or cfg.inference_server_port), Handler)
    return server, orch, tts_batcher


def serve(cfg: Config, port: int | None = None, engine: Engine | None = None,
          tts_pipeline=None):
    """Blocking HTTP server (reference: maxengine_server.main)."""
    server, orch, tts_batcher = make_server(cfg, port, engine, tts_pipeline)
    try:
        server.serve_forever()
    finally:
        orch.stop()
        if tts_batcher is not None:
            tts_batcher.stop()


def main(argv=None):
    import sys

    from maxtext_indextts2_tpu.config import load_config

    cfg = load_config(argv if argv is not None else sys.argv[1:])
    print(f"serving on :{cfg.inference_server_port}")
    serve(cfg)


if __name__ == "__main__":
    main()
