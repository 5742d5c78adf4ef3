"""Multi-host data loading: per-process local batches -> global jax.Array.

Reference: MaxText/multihost_dataloading.py:53-96 — each process loads its
shard and the global array is assembled with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding

from maxtext_indextts2_tpu.parallel.sharding import resolve


class MultiHostDataLoadIterator:
    def __init__(self, local_iterator, mesh: Mesh,
                 logical_axes=("activation_batch", "activation_length")):
        self.local_iterator = local_iterator
        self.mesh = mesh
        self.sharding = NamedSharding(mesh, resolve(logical_axes, mesh=mesh))

    def __iter__(self):
        return self

    def __next__(self):
        local = next(self.local_iterator)
        return {
            k: jax.make_array_from_process_local_data(self.sharding, np.asarray(v))
            for k, v in local.items()
        }
