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
