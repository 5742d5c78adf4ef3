"""Checkpointing via Orbax.

Reference: MaxText/checkpointing.py (create_orbax_checkpoint_manager:100,
load_state_if_possible:279, maybe_save_checkpoint:461). Supports async save,
full-state restore for resume, and params-only restore for inference /
fine-tune bootstrap.
"""

from __future__ import annotations

import logging
import os
import jax
import orbax.checkpoint as ocp

from maxtext_indextts2_tpu.config import Config

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Thin wrapper: save(step, state) / maybe_restore(abstract_state)."""

    def __init__(self, cfg: Config, directory: str | None = None):
        self.cfg = cfg
        self.directory = os.path.abspath(directory or cfg.checkpoint_dir)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(
            max_to_keep=cfg.checkpoint_max_to_keep,
            enable_async_checkpointing=cfg.async_checkpointing,
        )
        self.manager = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state, force: bool = False) -> bool:
        saved = self.manager.save(
            step, args=ocp.args.PyTreeSave(item=state), force=force
        )
        if saved:
            logger.info("saved checkpoint at step %d -> %s", step, self.directory)
        return saved

    def latest_step(self) -> int | None:
        return self.manager.latest_step()

    def maybe_restore(self, abstract_or_state):
        """Restore the latest full state, with shardings matching the target."""
        step = self.manager.latest_step()
        if step is None:
            return None

        def to_abstract(x):
            # keep the TARGET sharding on the abstract value: without it
            # Orbax restores with the sharding recorded at save time, which
            # breaks resuming onto a different mesh (resharded restore)
            if isinstance(x, jax.Array):
                return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
            return ocp.utils.to_shape_dtype_struct(x)

        target = jax.tree.map(to_abstract, abstract_or_state)
        restored = self.manager.restore(
            step,
            args=ocp.args.PyTreeRestore(
                item=target,
                restore_args=ocp.checkpoint_utils.construct_restore_args(target),
            ),
        )
        logger.info("restored checkpoint step %d from %s", step, self.directory)
        return restored

    def wait(self):
        self.manager.wait_until_finished()

    def close(self):
        self.manager.wait_until_finished()
        self.manager.close()


class EmergencyCheckpointManager:
    """Two-tier emergency checkpointing (reference: MaxText/checkpointing.py
    :144 create_orbax_emergency_checkpoint_manager + :183 replicator variant,
    rebuilt on plain Orbax so it runs anywhere).

    - LOCAL tier: fast disk, saved every ``local_period`` steps, keeps 2.
    - PERSISTENT tier: durable storage, saved every ``persistent_period``.
    - Restore prefers whichever tier holds the NEWEST step, so a preemption
      between persistent saves loses at most ``local_period`` steps.
    """

    def __init__(self, cfg: Config):
        local_dir = cfg.local_checkpoint_directory or os.path.join(
            cfg.checkpoint_dir, "..", "local_emergency"
        )
        self.local_period = max(
            1, cfg.local_checkpoint_period or cfg.checkpoint_period // 10
        )
        self.persistent_period = max(1, cfg.checkpoint_period)
        self.local_dir = os.path.abspath(local_dir)
        os.makedirs(self.local_dir, exist_ok=True)
        self.local = ocp.CheckpointManager(
            self.local_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=2,
                enable_async_checkpointing=cfg.async_checkpointing,
            ),
        )
        self.persistent = CheckpointManager(cfg)
        self._last_persistent = self.persistent.latest_step()

    def save(self, step: int, state, force: bool = False) -> bool:
        """Save to whichever tiers are due at this step. The train loop owns
        the cadence ((step+1) % local_period), so the local save is always
        forced — Orbax's own save_interval_steps gate is modulo-step-number
        and would silently reject the loop's odd-numbered steps.

        The persistent tier fires whenever ``persistent_period`` steps have
        elapsed since its last save — NOT on a modulo of the step number:
        save() is only called on local-period steps, so a modulo gate would
        silently fire only at multiples of lcm(local, persistent) whenever
        the periods don't divide (e.g. local 2, persistent 25 -> every 50)."""
        saved_local = self.local.save(
            step, args=ocp.args.PyTreeSave(item=state), force=True
        )
        saved_persistent = False
        last = self._last_persistent
        if force or last is None or step - last >= self.persistent_period:
            saved_persistent = self.persistent.save(step, state, force=True)
            if saved_persistent:
                self._last_persistent = step
        if saved_local:
            logger.info("emergency local save at step %d -> %s", step, self.local_dir)
        return saved_local or saved_persistent

    def latest_step(self) -> int | None:
        steps = [s for s in (self.local.latest_step(),
                             self.persistent.latest_step()) if s is not None]
        return max(steps) if steps else None

    def maybe_restore(self, abstract_or_state):
        """Restore from the tier with the newest step (local wins ties —
        it is the cheaper read and at least as fresh)."""
        local_step = self.local.latest_step()
        persistent_step = self.persistent.latest_step()
        if local_step is None and persistent_step is None:
            return None
        if persistent_step is None or (
            local_step is not None and local_step >= persistent_step
        ):
            def to_abstract(x):
                if isinstance(x, jax.Array):
                    return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding)
                return ocp.utils.to_shape_dtype_struct(x)

            target = jax.tree.map(to_abstract, abstract_or_state)
            restored = self.local.restore(
                local_step,
                args=ocp.args.PyTreeRestore(
                    item=target,
                    restore_args=ocp.checkpoint_utils.construct_restore_args(target),
                ),
            )
            logger.info(
                "restored EMERGENCY local checkpoint step %d from %s",
                local_step, self.local_dir,
            )
            return restored
        return self.persistent.maybe_restore(abstract_or_state)

    def wait(self):
        self.local.wait_until_finished()
        self.persistent.wait()

    def close(self):
        self.local.wait_until_finished()
        self.local.close()
        self.persistent.close()


def save_params_only(path: str, params) -> None:
    """Write a params-only checkpoint (inference artifact).

    Reference: MaxText/generate_param_only_checkpoint.py.
    """
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params)
    ckptr.wait_until_finished()
    ckptr.close()


# scan regions used by models/decoder.py _run_region (dense/moe split for
# DeepSeek-style first_num_dense_layers configs)
_LAYER_REGIONS = ("layers", "dense_layers", "moe_layers")


def params_checkpoint_is_scanned(path: str) -> bool | None:
    """Whether a params-only checkpoint stores scan-stacked decoder layers.

    True -> 'decoder/<region>' (training default scan_layers=true);
    False -> 'decoder/<region>_0' (unrolled training or engine-written);
    None -> no decoder subtree / unreadable metadata (caller decides).
    Regions: 'layers' plus the MoE split 'dense_layers'/'moe_layers'.
    """
    ckptr = ocp.StandardCheckpointer()
    try:
        tree = ckptr.metadata(os.path.abspath(path)).item_metadata.tree
    except Exception:  # noqa: BLE001 - absent/foreign checkpoint metadata
        return None
    finally:
        ckptr.close()
    if "params" in tree:
        tree = tree["params"]
    dec = tree.get("decoder")
    if not isinstance(dec, dict):
        return None
    if any(r in dec for r in _LAYER_REGIONS):
        return True

    def is_unrolled_key(k: str) -> bool:
        base, _, idx = k.rpartition("_")
        return base in _LAYER_REGIONS and idx.isdigit()

    if any(is_unrolled_key(k) for k in dec):
        return False
    return None


def load_params_only(path: str, abstract_params=None):
    ckptr = ocp.StandardCheckpointer()
    if abstract_params is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, abstract_params)
        out = ckptr.restore(os.path.abspath(path), target)
    else:
        out = ckptr.restore(os.path.abspath(path))
    ckptr.close()
    return out
