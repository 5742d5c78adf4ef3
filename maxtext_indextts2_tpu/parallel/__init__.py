from maxtext_indextts2_tpu.parallel.mesh import (
    create_device_mesh,
    maybe_initialize_distributed,
    mesh_shape_summary,
)
from maxtext_indextts2_tpu.parallel.pathways import (
    maybe_initialize_single_controller,
    running_under_proxy_backend,
)
from maxtext_indextts2_tpu.parallel.sharding import (
    LOGICAL_AXIS_RULES,
    assert_params_sufficiently_sharded,
    logical_to_mesh_axes,
    logical_to_sharding,
    resolve,
    shard,
    tree_logical_to_sharding,
    with_logical_partitioning,
)
