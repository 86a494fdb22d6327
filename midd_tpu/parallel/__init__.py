from midd_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    count_tp_sharded,
    image_sharding,
    make_mesh,
    param_shardings,
    replicated,
    shard_params,
)
from midd_tpu.parallel.train_dp import make_sharded_train_step  # noqa: F401
