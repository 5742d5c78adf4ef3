"""Elastic / fault-tolerant training: snapshot -> recover -> resume.

Reference: MaxText/elastic_train.py (elastic_handler:91, snapshot/reshard
loop:170, elastic_initialize:325 — built on the Pathways elastic manager) and
emergency checkpointing (checkpointing.py:144). Without Pathways this
framework provides the same capability surface single-controller style:

- periodic host-RAM snapshots of the train state (cheap device_get),
- a supervised step loop that catches device/step failures,
- recovery that rebuilds the mesh over the devices currently alive —
  including a RESIZE when devices were lost or regained (the reference's
  ``maybe_reshard_down``/``maybe_reshard_up``): parallelism degrees and
  batch sizes are re-derived for the surviving world, the snapshot is
  resharded onto the new mesh, and training CONTINUES from the snapshot
  step (not restart-from-scratch),
- an emergency checkpoint written to local disk on unrecoverable errors.

``failure_injector`` lets tests (and the disruption-management bench) inject
faults at chosen steps, mirroring reference benchmarks/disruption_management;
``devices_fn`` lets them shrink/grow the visible device set mid-run.
"""

from __future__ import annotations

import dataclasses
import logging
from collections.abc import Callable

import jax
import numpy as np

from maxtext_indextts2_tpu.config import Config, finalize
from maxtext_indextts2_tpu.models import Transformer
from maxtext_indextts2_tpu.parallel import create_device_mesh
from maxtext_indextts2_tpu.train.train import (
    batch_sharding,
    create_data_iterator,
    jit_train_step,
    setup_train_state,
)

logger = logging.getLogger(__name__)


class Snapshot:
    """Host-RAM copy of the train state (reference: elastic snapshot)."""

    def __init__(self):
        self.step: int | None = None
        self.state_host = None

    def save(self, step: int, state):
        self.state_host = jax.tree.map(lambda x: np.asarray(jax.device_get(x)), state)
        self.step = step

    def restore_onto(self, target_state, shardings):
        """Rebuild using the NEW state's treedef (its static fields — apply_fn,
        tx — belong to the rebuilt model; only array leaves come from the
        snapshot). The shardings may live on a DIFFERENT (resized) mesh than
        the one the snapshot was taken on: device_put reshards."""
        assert self.state_host is not None
        host_leaves = jax.tree.leaves(self.state_host)
        shard_leaves = jax.tree.leaves(shardings)
        new_leaves = [
            jax.device_put(h, s) for h, s in zip(host_leaves, shard_leaves)
        ]
        return jax.tree.unflatten(jax.tree.structure(target_state), new_leaves)


def resize_config(cfg: Config, num_devices: int, resize_axis: str = "fsdp") -> Config:
    """Re-derive a config for a different device count (reference:
    elastic_handler rebuilding pyconfig state for the surviving slices).

    ``resize_axis`` is the ici axis that absorbs the change (the reference
    shrinks the dcn data axis when a slice dies; single-slice elasticity
    shrinks fsdp/data). Batch sizes re-derive from per_device_batch_size, so
    the global batch scales with the surviving world — the reference's
    fixed-per-slice-batch behavior."""
    if num_devices == cfg.num_devices:
        return cfg
    new = dataclasses.replace(cfg)
    setattr(new, f"ici_{resize_axis}_parallelism", -1)
    return finalize(new, num_devices)


def elastic_train_loop(
    cfg: Config,
    snapshot_period: int = 5,
    failure_injector: Callable[[int], None] | None = None,
    max_recoveries: int = 3,
    devices_fn: Callable[[], list] | None = None,
    resize_axis: str = "fsdp",
) -> dict:
    """Train with snapshot-recovery (and live resize when ``devices_fn``
    reports a changed device set after a failure). Returns final metrics +
    recovery count + the final world size."""
    snapshot = Snapshot()
    recoveries = 0

    def build_world():
        devices = list(devices_fn()) if devices_fn is not None else jax.devices()
        wcfg = resize_config(cfg, len(devices), resize_axis)
        mesh = create_device_mesh(wcfg, devices=devices)
        model = Transformer(cfg=wcfg, mesh=mesh)
        state, (shardings, _) = setup_train_state(
            wcfg, model, mesh, jax.random.PRNGKey(wcfg.init_weights_seed)
        )
        p_step = jit_train_step(model, wcfg, mesh, shardings)
        data_iter = create_data_iterator(wcfg)
        return wcfg, mesh, model, state, shardings, p_step, data_iter

    wcfg, mesh, model, state, shardings, p_step, data_iter = build_world()
    rng = jax.random.PRNGKey(cfg.seed)
    dshard = batch_sharding(mesh)
    step = 0
    metrics = {}

    while step < cfg.steps:
        try:
            if step % snapshot_period == 0:
                snapshot.save(step, state)
            if failure_injector is not None:
                failure_injector(step)
            batch = next(data_iter)
            batch = jax.tree.map(
                lambda x: jax.device_put(
                    np.asarray(x)[: wcfg.global_batch_size_to_train_on], dshard
                ),
                batch,
            )
            rng, srng = jax.random.split(rng)
            with mesh:
                state, metrics = p_step(state, batch, srng)
            step += 1
        except Exception as e:  # noqa: BLE001 — elastic recovery is the point
            recoveries += 1
            logger.warning("step %d failed (%s); recovery %d", step, e, recoveries)
            if recoveries > max_recoveries:
                _emergency_checkpoint(cfg, snapshot)
                raise
            # rebuild the world over whatever devices survive (reference
            # elastic_handler: maybe_reshard_down) and rewind to the snapshot
            wcfg, mesh, model, state, shardings, p_step, data_iter = build_world()
            dshard = batch_sharding(mesh)
            if snapshot.step is not None:
                state = snapshot.restore_onto(state, shardings)
                step = snapshot.step
            rng = jax.random.PRNGKey(cfg.seed + recoveries)

    out = {k: np.asarray(v) for k, v in metrics.items()}
    out["recoveries"] = recoveries
    out["final_step"] = step
    out["final_num_devices"] = wcfg.num_devices
    out["final_global_batch"] = wcfg.global_batch_size_to_train_on
    return out


def _emergency_checkpoint(cfg: Config, snapshot: Snapshot):
    """Write the last snapshot to local disk (reference: emergency ckpt)."""
    if snapshot.state_host is None:
        return
    import os

    from maxtext_indextts2_tpu.train.checkpointing import save_params_only

    path = os.path.join(cfg.base_output_directory, cfg.run_name, "emergency")
    try:
        save_params_only(path, snapshot.state_host.params)
        logger.warning("emergency checkpoint written to %s (step %s)", path, snapshot.step)
    except Exception:  # noqa: BLE001
        logger.exception("emergency checkpoint failed")
