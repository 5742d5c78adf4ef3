"""Single-controller (Pathways-class) runtime initialization.

Reference: MaxText/train.py:32,713 — the reference imports ``pathwaysutils``
unconditionally and calls ``pathwaysutils.initialize()`` at startup so that
a Pathways proxy backend (``JAX_PLATFORMS=proxy``) can serve the whole pod
to a single controller process. Elastic training (elastic_train.py:325) and
colocated-python data input (multihost_dataloading.py:125) build on it.

This framework keeps the capability behind an explicit gate:

- ``enable_single_controller=true`` (or ``JAX_PLATFORMS=proxy`` in the
  environment) triggers initialization,
- ``pathwaysutils`` is imported lazily with a clear error when absent — the
  library only exists inside Pathways-enabled deployments, so multi-process
  SPMD runs (the default, ``jax.distributed``-based — parallel/mesh.py)
  never touch it.

The rest of the framework is backend-agnostic by construction: meshes come
from ``jax.devices()`` whatever the backend, data input has a
controller-offloaded path that does not require Pathways
(train/data/colocated.py), and elastic recovery is snapshot-based
(train/elastic.py) rather than tied to the Pathways elastic manager.
"""

from __future__ import annotations

import logging
import os

logger = logging.getLogger(__name__)


def running_under_proxy_backend() -> bool:
    """True when JAX is pointed at a Pathways proxy backend."""
    return "proxy" in os.environ.get("JAX_PLATFORMS", "").lower()


def maybe_initialize_single_controller(cfg=None) -> bool:
    """Initialize the Pathways client when requested; returns True if it ran.

    Called before any jax.devices() / mesh construction (train.py main,
    decode/serving entry points). A no-op unless the run opted in via
    ``enable_single_controller`` or ``JAX_PLATFORMS=proxy``.
    """
    requested = bool(getattr(cfg, "enable_single_controller", False))
    if not requested and not running_under_proxy_backend():
        return False
    try:
        import pathwaysutils  # noqa: PLC0415 — only exists on Pathways deployments
    except ImportError as e:
        raise ImportError(
            "single-controller mode requires the `pathwaysutils` package "
            "(present on Pathways-enabled Cloud deployments). Either install "
            "it, or run multi-process SPMD instead: unset JAX_PLATFORMS / "
            "set enable_single_controller=false and launch one process per "
            "host (parallel/mesh.py maybe_initialize_distributed)."
        ) from e
    pathwaysutils.initialize()
    logger.info("pathwaysutils initialized (single-controller mode)")
    return True
