from gt4py_tpu.parallel.mesh import CartesianMesh  # noqa: F401
from gt4py_tpu.parallel.distributed import DistributedStencil  # noqa: F401
from gt4py_tpu.parallel.halo import exchange_halos_2d  # noqa: F401
from gt4py_tpu.parallel.next_fields import (  # noqa: F401
    constrain_field,
    field_sharding,
    shard_field,
)
from gt4py_tpu.parallel.unstructured import (  # noqa: F401
    ShardedGather,
    halo_gather,
    partition_gather,
    ring_partition,
)
