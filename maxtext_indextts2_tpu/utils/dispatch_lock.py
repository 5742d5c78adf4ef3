"""Process-wide device-dispatch serialization.

A single chip executes one program at a time regardless of how many host
threads dispatch to it — but dispatching from several threads at once can
fail at the runtime layer (measured: the axon relay returns
'INTERNAL: TPU backend error' when the serving orchestrator's decode loop
and the TTS batcher's S2A pass dispatch concurrently; the reference never
hits this because its S2A stage is offline torch on another host,
SURVEY.md §2.9). Serializing dispatch host-side costs nothing the chip
wasn't already paying and makes multi-stage single-chip serving
deterministic.

``device_dispatch()`` is a reentrant, FIFO-fair lock: fairness matters
because the decode loop re-acquires in a tight loop and a plain
threading.Lock would starve the S2A thread behind it indefinitely.
"""

from __future__ import annotations

import collections
import contextlib
import threading

__all__ = ["device_dispatch"]


class _FairRLock:
    """Reentrant lock granting waiters in FIFO order."""

    def __init__(self):
        self._cv = threading.Condition()
        self._owner: int | None = None
        self._count = 0
        self._waiters: collections.deque[int] = collections.deque()

    def acquire(self):
        me = threading.get_ident()
        with self._cv:
            if self._owner == me:
                self._count += 1
                return
            self._waiters.append(me)
            try:
                while self._owner is not None or self._waiters[0] != me:
                    self._cv.wait()
            except BaseException:
                # Interrupted mid-wait (e.g. KeyboardInterrupt at shutdown):
                # leaving our ident queued would wedge every later acquire on
                # `_waiters[0] != me` forever. Remove it and wake the others.
                self._waiters.remove(me)
                self._cv.notify_all()
                raise
            self._waiters.popleft()
            self._owner = me
            self._count = 1

    def release(self):
        with self._cv:
            if self._owner != threading.get_ident():
                raise RuntimeError("release of un-owned dispatch lock")
            self._count -= 1
            if self._count == 0:
                self._owner = None
                self._cv.notify_all()

    def __enter__(self):
        self.acquire()
        return self

    def __exit__(self, *exc):
        self.release()
        return False


_LOCK = _FairRLock()


@contextlib.contextmanager
def device_dispatch():
    """Hold while dispatching (and fetching) device work from a thread that
    may race another device-using thread in this process."""
    with _LOCK:
        yield
