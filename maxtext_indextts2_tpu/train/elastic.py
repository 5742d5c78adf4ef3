"""Elastic / fault-tolerant training: snapshot -> recover -> resume.

Reference: MaxText/elastic_train.py (elastic_handler:91, snapshot/reshard
loop:170, elastic_initialize:325 — built on the Pathways elastic manager) and
emergency checkpointing (checkpointing.py:144). Without Pathways this
framework provides the same capability surface single-controller style:

- periodic host-RAM snapshots of the train state (cheap device_get),
- a supervised step loop that catches device/step failures,
- recovery that rebuilds the mesh over (possibly fewer) devices, re-jits,
  restores the snapshot, and rewinds to the snapshot step,
- an emergency checkpoint written to local disk on unrecoverable errors.

``failure_injector`` lets tests (and the disruption-management bench) inject
faults at chosen steps, mirroring reference benchmarks/disruption_management.
"""

from __future__ import annotations

import logging
from collections.abc import Callable

import jax
import numpy as np

from maxtext_indextts2_tpu.config import Config
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
        snapshot)."""
        assert self.state_host is not None
        host_leaves = jax.tree.leaves(self.state_host)
        shard_leaves = jax.tree.leaves(shardings)
        new_leaves = [
            jax.device_put(h, s) for h, s in zip(host_leaves, shard_leaves)
        ]
        return jax.tree.unflatten(jax.tree.structure(target_state), new_leaves)


def elastic_train_loop(
    cfg: Config,
    snapshot_period: int = 5,
    failure_injector: Callable[[int], None] | None = None,
    max_recoveries: int = 3,
) -> dict:
    """Train with snapshot-recovery. Returns final metrics + recovery count."""
    snapshot = Snapshot()
    recoveries = 0

    def build_world():
        mesh = create_device_mesh(cfg)
        model = Transformer(cfg=cfg, mesh=mesh)
        state, (shardings, _) = setup_train_state(
            cfg, model, mesh, jax.random.PRNGKey(cfg.init_weights_seed)
        )
        p_step = jit_train_step(model, cfg, mesh, shardings)
        data_iter = create_data_iterator(cfg)
        return mesh, model, state, shardings, p_step, data_iter

    mesh, model, state, shardings, p_step, data_iter = build_world()
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
                    np.asarray(x)[: cfg.global_batch_size_to_train_on], dshard
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
            # rebuild the world (reference elastic_handler) and rewind
            mesh, model, state, shardings, p_step, data_iter = build_world()
            dshard = batch_sharding(mesh)
            if snapshot.step is not None:
                state = snapshot.restore_onto(state, shardings)
                step = snapshot.step
            rng = jax.random.PRNGKey(cfg.seed + recoveries)

    out = {k: np.asarray(v) for k, v in metrics.items()}
    out["recoveries"] = recoveries
    out["final_step"] = step
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
