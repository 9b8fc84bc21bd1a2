from st_dadk_tpu.parallel.mesh import make_mesh, lane_sharding, replicated  # noqa: F401
from st_dadk_tpu.parallel.data_parallel import make_dp_train_step  # noqa: F401
from st_dadk_tpu.parallel.multihost import (  # noqa: F401
    experiment_mesh_auto,
    hybrid_mesh,
    maybe_initialize_distributed,
    process_lane_slice,
    shard_lanes_multihost,
)
