from midd_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    count_tp_sharded,
    image_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)
from midd_tpu.parallel.multihost import (  # noqa: F401
    host_local_batch_to_global,
    init_distributed,
    make_hybrid_mesh,
    mesh_fabric_report,
    process_batch_slice,
)
from midd_tpu.parallel.train_dp import make_sharded_train_step  # noqa: F401
