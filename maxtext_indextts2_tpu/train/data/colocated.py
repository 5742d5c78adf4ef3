"""Controller-offloaded ("colocated") data loading.

Reference: MaxText/multihost_dataloading.py:125-216 — a RemoteIterator built
on ``jax.experimental.colocated_python``: under Pathways single-controller
topologies the input pipeline runs in CPU processes colocated with each
host's devices, and the controller only receives ready arrays
(base.yml:492 ``colocated_python_data_input``).

TPU-native equivalent: the pipeline runs in a sidecar *process* that
prefetches batches into a bounded queue, so tokenization / packing / disk
IO never serialize against the controller's dispatch loop. The sidecar is
spawned fresh (never forked — a forked child would inherit live TPU client
state) and pins itself to the CPU backend before any array op, so it can
never grab the chip. Determinism/resume is preserved: every batch is tagged
with the inner iterator's post-batch state, and ``get_state``/``set_state``
round-trip through the train checkpoint exactly like the in-process
pipelines (train/checkpointing.py data-iterator state).

Wired behind the reference's knob name: ``colocated_python_data_input=true``
(config.py) wraps whatever ``dataset_type`` selects.
"""

from __future__ import annotations

import logging
import multiprocessing as mp
import pickle
import queue as queue_lib

import numpy as np

logger = logging.getLogger(__name__)

_END = "__end__"  # inner iterator exhausted
_ERR = "__err__"  # inner iterator raised


def _worker_main(cfg_bytes: bytes, init_state: bytes | None, batch_q, stop_evt):
    """Sidecar entry: build the real iterator and stream (batch, state) pairs."""
    import os

    # Before ANY jax array op: the sidecar must never initialize a TPU
    # backend (single-client runtimes would wedge the controller's chip).
    # sitecustomize may have imported jax already (snapshotting JAX_PLATFORMS
    # from the parent env), so pin the live config too, not just the env.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")

    try:
        import dataclasses

        from maxtext_indextts2_tpu.train.train import create_data_iterator

        cfg = pickle.loads(cfg_bytes)
        cfg = dataclasses.replace(cfg, colocated_python_data_input=False)
        it = create_data_iterator(cfg)
        skip = 0
        if init_state:
            st = pickle.loads(init_state)
            if st.get("inner") is not None and hasattr(it, "set_state"):
                it.set_state(st["inner"])
            else:
                skip = st.get("consumed", 0)  # deterministic fast-forward
        for _ in range(skip):
            next(it)
        while not stop_evt.is_set():
            try:
                batch = next(it)
            except StopIteration:
                batch_q.put(_END)
                return
            batch = {k: np.asarray(v) for k, v in batch.items()}
            state = it.get_state() if hasattr(it, "get_state") else None
            while not stop_evt.is_set():
                try:
                    batch_q.put((batch, state), timeout=0.2)
                    break
                except queue_lib.Full:
                    continue
    except Exception as e:  # noqa: BLE001 — relayed to the controller
        try:
            batch_q.put((_ERR, repr(e)))
        except Exception:  # noqa: BLE001
            pass


class ColocatedDataIterator:
    """Runs the configured input pipeline in a sidecar process.

    Lazy-start: the sidecar spawns on the first ``__next__`` so that
    ``set_state`` (checkpoint restore) can still reposition the stream.
    """

    def __init__(self, cfg, prefetch: int = 4, timeout_s: float = 300.0):
        self.cfg = cfg
        self.prefetch = prefetch
        self.timeout_s = timeout_s
        self._ctx = mp.get_context("spawn")
        self._proc = None
        self._queue = None
        self._stop = None
        self._pending_state: bytes | None = None
        self._consumed = 0
        self._last_inner_state = None

    # -- lifecycle -----------------------------------------------------
    def _start(self):
        self._queue = self._ctx.Queue(maxsize=self.prefetch)
        self._stop = self._ctx.Event()
        self._proc = self._ctx.Process(
            target=_worker_main,
            args=(pickle.dumps(self.cfg), self._pending_state, self._queue, self._stop),
            daemon=True,
        )
        self._proc.start()
        logger.info("colocated data sidecar started (pid %d)", self._proc.pid)

    def close(self):
        if self._proc is None:
            return
        self._stop.set()
        try:  # drain so the sidecar's put() unblocks
            while True:
                self._queue.get_nowait()
        except queue_lib.Empty:
            pass
        self._proc.join(timeout=5.0)
        if self._proc.is_alive():
            self._proc.terminate()
            self._proc.join(timeout=5.0)
        self._proc = None

    def __del__(self):
        try:
            self.close()
        except Exception:  # noqa: BLE001 — interpreter teardown
            pass

    # -- iteration -----------------------------------------------------
    def __iter__(self):
        return self

    def __next__(self) -> dict:
        if self._proc is None:
            self._start()
        try:
            item = self._queue.get(timeout=self.timeout_s)
        except queue_lib.Empty as e:
            alive = self._proc.is_alive()
            raise RuntimeError(
                f"colocated data sidecar produced nothing for {self.timeout_s}s "
                f"(alive={alive}) — check the dataset config"
            ) from e
        if item == _END:
            raise StopIteration
        if isinstance(item, tuple) and item[0] == _ERR:
            raise RuntimeError(f"colocated data sidecar failed: {item[1]}")
        batch, inner_state = item
        self._consumed += 1
        self._last_inner_state = inner_state
        return batch

    # -- checkpointable state (train/checkpointing.py protocol) ---------
    def get_state(self) -> bytes:
        return pickle.dumps(
            {"consumed": self._consumed, "inner": self._last_inner_state}
        )

    def set_state(self, state: bytes):
        if self._proc is not None:
            self.close()
        self._pending_state = state
        st = pickle.loads(state) if state else {}
        self._consumed = st.get("consumed", 0)
        self._last_inner_state = st.get("inner")
