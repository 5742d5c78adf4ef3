"""FIFO-fair reentrant device-dispatch lock (utils/dispatch_lock.py)."""

import threading
import time

from maxtext_indextts2_tpu.utils.dispatch_lock import _FairRLock, device_dispatch


def test_reentrant():
    lock = _FairRLock()
    with lock:
        with lock:  # same thread re-acquires without deadlock
            pass
    # fully released: another thread can take it immediately
    got = []
    t = threading.Thread(target=lambda: (lock.acquire(), got.append(1),
                                         lock.release()))
    t.start()
    t.join(timeout=5)
    assert got == [1]


def test_release_requires_owner():
    lock = _FairRLock()
    try:
        lock.release()
        raised = False
    except RuntimeError:
        raised = True
    assert raised


def test_fifo_order_under_contention():
    """A tight re-acquire loop must not starve other waiters: grants go in
    arrival order, so every thread makes progress."""
    lock = _FairRLock()
    order = []

    def worker(name, rounds):
        for _ in range(rounds):
            with lock:
                order.append(name)
                time.sleep(0.001)

    threads = [threading.Thread(target=worker, args=(i, 20)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert len(order) == 60
    # fairness: no long same-thread runs while others wait — a plain
    # threading.Lock lets one looping thread hog dozens of grants in a row;
    # FIFO hand-off keeps runs short. (Runs can exceed 1 only near the ends
    # when other threads are done or not yet queued.)
    longest, cur = 1, 1
    mid = order[5:-5]
    for a, b in zip(mid, mid[1:]):
        cur = cur + 1 if a == b else 1
        longest = max(longest, cur)
    assert longest <= 5, (longest, order)


def test_context_manager():
    with device_dispatch():
        with device_dispatch():  # reentrant through the contextmanager too
            pass


def test_interrupted_waiter_does_not_wedge():
    """A waiter interrupted inside cv.wait() (e.g. KeyboardInterrupt at
    shutdown) must remove itself from the FIFO queue — leaving its ident at
    the head would make every later acquire wait forever."""
    lock = _FairRLock()
    lock.acquire()  # main thread holds the lock

    orig_wait = lock._cv.wait
    state = {"raised": False, "interrupted": False, "acquired": False}

    def flaky_wait(timeout=None):
        if not state["raised"]:
            state["raised"] = True
            raise KeyboardInterrupt()
        return orig_wait(timeout)

    lock._cv.wait = flaky_wait

    def waiter_b():
        try:
            lock.acquire()
        except BaseException:
            state["interrupted"] = True

    b = threading.Thread(target=waiter_b)
    b.start()
    b.join(timeout=5)
    assert state["interrupted"], "waiter should have been interrupted"
    lock._cv.wait = orig_wait
    lock.release()

    def waiter_c():
        lock.acquire()
        state["acquired"] = True
        lock.release()

    c = threading.Thread(target=waiter_c)
    c.start()
    c.join(timeout=5)
    assert state["acquired"], "lock wedged by the interrupted waiter's stale queue entry"
