"""Device mesh construction.

TPU-native equivalent of the reference's mesh layer
(reference: MaxText/maxtext_utils.py:1168 create_device_mesh,
MaxText/max_utils.py:132 maybe_initialize_jax_distributed_system).
Single-slice meshes use ``mesh_utils.create_device_mesh``; multi-slice
(DCN-connected) topologies use ``create_hybrid_device_mesh`` so that each
dcn_* degree maps across slices and each ici_* degree maps within a slice.
"""

from __future__ import annotations

import logging

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh

from maxtext_indextts2_tpu.config import Config

logger = logging.getLogger(__name__)


def create_device_mesh(cfg: Config, devices=None) -> Mesh:
    """Build the named device mesh from the config's ici/dcn degrees."""
    if devices is None:
        devices = jax.devices()
    num_devices = len(devices)

    ici = [cfg.ici_parallelism()[ax] for ax in cfg.mesh_axes]
    dcn = [cfg.dcn_parallelism()[ax] for ax in cfg.mesh_axes]

    multi_slice = cfg.num_slices > 1
    # Locality-blind reshape fallbacks are ONLY for virtual devices (CPU
    # test meshes / dryruns): on real TPU fleets a mesh-construction error
    # (dcn degrees not matching the slice count, bad ici factorization)
    # must raise loudly — a silently reshaped mesh sends ICI traffic over
    # DCN, a severe and hard-to-diagnose performance cliff.
    virtual = any(
        getattr(d, "slice_index", None) is None or d.platform != "tpu"
        for d in devices
    )
    if multi_slice:
        if not virtual:
            mesh_devices = mesh_utils.create_hybrid_device_mesh(
                ici,
                dcn,
                devices,
                allow_split_physical_axes=cfg.allow_split_physical_axes,
            )
        else:
            # Virtual devices carry no slice_index; lay slices out DCN-major
            # per axis by plain reshape — the axis SIZES (dcn[i] * ici[i])
            # and orderings are what sharding validation needs, physical
            # locality doesn't exist here.
            shape = [d * i for d, i in zip(dcn, ici)]
            # [slices, per-slice ici...] -> interleave each dcn axis ahead
            # of its ici axis, then merge pairwise
            arr = np.asarray(devices).reshape(dcn + ici)
            order = [x for pair in zip(range(len(dcn)), range(len(dcn), 2 * len(dcn))) for x in pair]
            mesh_devices = arr.transpose(order).reshape(shape)
    else:
        try:
            mesh_devices = mesh_utils.create_device_mesh(
                ici,
                devices,
                contiguous_submeshes=False,
                allow_split_physical_axes=cfg.allow_split_physical_axes,
            )
        except (NotImplementedError, ValueError):
            if not virtual:
                raise
            # Plain reshape for CPU test meshes with non-power-of-two
            # factorizations.
            mesh_devices = np.asarray(devices).reshape(ici)

    mesh = Mesh(mesh_devices, cfg.mesh_axes)
    logger.info("created mesh: %s (%d devices)", dict(mesh.shape), num_devices)
    return mesh


def maybe_initialize_distributed(cfg: Config) -> None:
    """Initialize jax.distributed for multi-process runs (no-op single process).

    Reference: MaxText/max_utils.py:132-366. On TPU pods JAX discovers the
    coordinator itself; explicit initialization is only needed when the
    launcher provides coordinates via env.
    """
    import os

    if jax.process_count() > 1 or os.environ.get("JAX_COORDINATOR_ADDRESS"):
        try:
            jax.distributed.initialize()
        except (RuntimeError, ValueError) as e:  # already initialized
            logger.info("jax.distributed.initialize skipped: %s", e)


def mesh_shape_summary(mesh: Mesh) -> dict[str, int]:
    return {ax: size for ax, size in mesh.shape.items() if size > 1}
